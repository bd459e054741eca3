package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, DoubleType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass kernel for the Gopher A1.1 word-n-gram repetition signals
  * (Rae et al. 2021, table A1): for each configured n it computes
  *
  *   - top fraction: characters covered by occurrences of the MOST
  *     frequent word n-gram (paper: n = 2, 3, 4), and
  *   - dup fraction: characters covered by n-grams occurring more than
  *     once (paper: n = 5..10),
  *
  * both over the whitespace-normalized lowercased text, capped at 1.
  *
  * Semantics are bit-identical to the Column-algebra reference
  * implementations [[graft.ops.TextAnalysis.topNgramCharFraction]] /
  * [[graft.ops.TextAnalysis.dupNgramCharFraction]] (pinned by an
  * OpsSpec equivalence test and by the q_ngram_repetition DuckDB
  * oracle), but where the Column version runs one interpreted
  * `array_sort` + `aggregate` fold per n — nine HOF passes per
  * document under the default Gopher config, none of which enter
  * whole-stage codegen — this expression tokenizes ONCE and counts all
  * n-gram families in a single JVM pass with `doGenCode` delegating to
  * a static kernel, so the surrounding projection stays inside
  * whole-stage codegen. This is the 100 TB path for
  * [[graft.ops.QualityFilters.repetitionFilter]].
  */
object NgramRepetition {

  /** Replicates `trim(text)` (Spark's StringTrim strips 0x20 only —
    * NOT general whitespace; a leading tab survives and yields a
    * leading empty token after the `\s+` split, and the kernel must
    * reproduce that quirk bit-for-bit). */
  private def sparkTrim(s: UTF8String): UTF8String = s.trim()

  /** All fractions for one document, in one tokenization pass.
    * Also called from generated code.
    *
    * @param topNs ns for the most-frequent-gram fraction (sorted)
    * @param dupNs ns for the duplicated-grams fraction (sorted)
    * @return struct of doubles, topNs fields then dupNs fields
    */
  def compute(text: UTF8String, topNs: Array[Int], dupNs: Array[Int]): InternalRow = {
    // tokens(lower(text)) = split(trim(lower(text)), "\\s+"):
    // UTF8String.toLowerCase is exactly Spark's Lower, trim() exactly
    // StringTrim, Tok.splitWs exactly Pattern.split(str, -1).
    val str = sparkTrim(text.toLowerCase).toString
    val toks = if (str.isEmpty) null else Tok.splitWs(str)
    computeFromToks(toks, topNs, dupNs)
  }

  /** [[compute]] over PRE-TOKENIZED `tokens(lower(text))` — the
    * hygiene-verdict kernel already holds exactly this array (same
    * lower → trim → split chain), so its repetition stage passes it in
    * instead of re-lowercasing and re-splitting the document. `toks`
    * null or empty = the empty-after-trim document (tokenCount 0). */
  def computeFromToks(toks: Array[String], topNs: Array[Int],
      dupNs: Array[Int]): InternalRow = {
    val out = new Array[Any](topNs.length + dupNs.length)
    java.util.Arrays.fill(out.asInstanceOf[Array[AnyRef]], java.lang.Double.valueOf(0.0))
    if (toks == null || toks.length == 0) return new GenericInternalRow(out)
    val numToks = toks.length

    // Code-point lengths (Spark `length` counts code points, not
    // UTF-16 units) + prefix sums so any gram's joined length is O(1):
    // len(toks[i..i+n)) joined by ' ' = pre(i+n) - pre(i) + (n-1).
    val pre = new Array[Long](numToks + 1)
    var i = 0
    while (i < numToks) {
      pre(i + 1) = pre(i) + toks(i).codePointCount(0, toks(i).length)
      i += 1
    }
    // normCharCount = length(array_join(toks, " "))
    val normChars = pre(numToks) + (numToks - 1).toLong
    if (normChars == 0L) return new GenericInternalRow(out)

    // Intern tokens to dense int ids: gram equality then reduces to
    // int-sequence equality (the single-space join of whitespace-free
    // tokens is injective, so sequence equality IS joined-string
    // equality) and the per-family counting needs no string building
    // or string hashing at all.
    val ids = new Array[Int](numToks)
    val intern = new java.util.HashMap[String, Integer]()
    i = 0
    while (i < numToks) {
      val t = toks(i)
      val e = intern.get(t)
      if (e == null) {
        val id = intern.size()
        intern.put(t, Integer.valueOf(id))
        ids(i) = id
      } else ids(i) = e.intValue()
      i += 1
    }

    // Families in ascending n order (the two config arrays are each
    // sorted; merge them) so the per-position gram hashes ROLL
    // forward: extending every start position's hash by one token per
    // unit of n replaces the per-family inner rehash loop — sum(n)
    // multiplies per position become max(n), ~4x less hash arithmetic
    // under the Gopher default (top 2,3,4 / dup 5..10). The hash fold
    // is unchanged (h = h*31 + id from the FNV offset), and every hit
    // is still verified by id-range compare, so counts cannot change.
    val nFam = topNs.length + dupNs.length
    val famN = new Array[Int](nFam)
    val famIsTop = new Array[Boolean](nFam)
    val famOut = new Array[Int](nFam)
    var ti = 0
    var di = 0
    var w = 0
    while (w < nFam) {
      if (di >= dupNs.length || (ti < topNs.length && topNs(ti) <= dupNs(di))) {
        famN(w) = topNs(ti); famIsTop(w) = true; famOut(w) = ti; ti += 1
      } else {
        famN(w) = dupNs(di); famIsTop(w) = false
        famOut(w) = topNs.length + di; di += 1
      }
      w += 1
    }
    if (nFam > 0 && numToks >= famN(0)) {
      // one open-addressing table sized for the SMALLEST n (most
      // grams), reused by every family: linear probing, exact
      // verification by id-range compare on every hit (collisions
      // cannot miscount); a larger-than-needed cap only lowers the
      // load factor for the bigger ns.
      val maxGrams = numToks - famN(0) + 1
      var cap = 4
      while (cap < maxGrams * 2) cap <<= 1
      val mask = cap - 1
      val slotStart = new Array[Int](cap)
      val slotCount = new Array[Long](cap)
      val roll = new Array[Int](numToks)
      java.util.Arrays.fill(roll, -2128831035)
      var curN = 0
      var f = 0
      while (f < nFam && numToks >= famN(f)) {
        val n = famN(f)
        while (curN < n) {
          var s = 0
          val lim = numToks - curN
          while (s < lim) { roll(s) = roll(s) * 31 + ids(s + curN); s += 1 }
          curN += 1
        }
        val grams = numToks - n + 1
        java.util.Arrays.fill(slotStart, -1)
        var s = 0
        while (s < grams) {
          val h = roll(s)
          var idx = (h ^ (h >>> 16)) & mask
          var placed = false
          while (!placed) {
            val st = slotStart(idx)
            if (st == -1) {
              slotStart(idx) = s
              slotCount(idx) = 1L
              placed = true
            } else {
              var eq = true
              var j = 0
              while (eq && j < n) {
                if (ids(st + j) != ids(s + j)) eq = false
                j += 1
              }
              if (eq) { slotCount(idx) += 1L; placed = true }
              else idx = (idx + 1) & mask
            }
          }
          s += 1
        }
        var frac = 0.0
        if (famIsTop(f)) {
          // max count; ties break toward the longer gram — same as the
          // reference fold's (bestCnt, bestLen) pair.
          var bestCnt = 0L
          var bestLen = 0L
          var c = 0
          while (c < cap) {
            val st = slotStart(c)
            if (st != -1) {
              val cnt = slotCount(c)
              val len = pre(st + n) - pre(st) + (n - 1)
              if (cnt > bestCnt || (cnt == bestCnt && len > bestLen)) {
                bestCnt = cnt
                bestLen = len
              }
            }
            c += 1
          }
          frac = math.min(1.0, (bestCnt * bestLen).toDouble / normChars)
        } else {
          var dupChars = 0L
          var c = 0
          while (c < cap) {
            val st = slotStart(c)
            if (st != -1 && slotCount(c) > 1L)
              dupChars += slotCount(c) * (pre(st + n) - pre(st) + (n - 1))
            c += 1
          }
          frac = math.min(1.0, dupChars.toDouble / normChars)
        }
        out(famOut(f)) = frac
        f += 1
      }
    }
    new GenericInternalRow(out)
  }

  /** Column API: struct of all repetition fractions in one pass.
    * Field names: `top_<n>gram_frac`, `dup_<n>gram_frac`. */
  def ngramRepetitionStats(text: Column,
      topNs: Seq[Int] = Seq(2, 3, 4),
      dupNs: Seq[Int] = Seq(5, 6, 7, 8, 9, 10)): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      NgramRepetitionExpr(ColumnBridge.expression(text), topNs, dupNs))
  }

  /** Kernel twin of [[graft.ops.TextAnalysis.dupLineRatio]] (fraction
    * of non-blank lines duplicating an earlier line) — bit-identical
    * semantics, including the trim-strips-spaces-only blank test, but
    * codegen'd: the Column version's `filter` lambda is a HOF, and ONE
    * CodegenFallback expression evicts the whole projection from
    * whole-stage codegen. Also called from generated code. */
  def dupLineRatioCompute(text: UTF8String): Double = {
    // split(text, "\n") with Spark's default limit -1, then
    // filter(l => length(trim(l)) > 0): non-blank = any char != 0x20
    val lines = text.toString.split("\n", -1)
    var kept = 0
    val seen = new java.util.HashSet[String]()
    var dups = 0
    var i = 0
    while (i < lines.length) {
      val l = lines(i)
      var blank = true
      var j = 0
      while (blank && j < l.length) { if (l.charAt(j) != ' ') blank = false; j += 1 }
      if (!blank) {
        kept += 1
        if (!seen.add(l)) dups += 1
      }
      i += 1
    }
    if (kept == 0) 0.0 else dups.toDouble / kept
  }

  /** Column API: codegen'd duplicate-line ratio. */
  def dupLineRatioFast(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(DupLineRatioExpr(ColumnBridge.expression(text)))
  }
}

/** See [[NgramRepetition.dupLineRatioCompute]]. */
case class DupLineRatioExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dup_line_ratio needs string, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    NgramRepetition.dupLineRatioCompute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NgramRepetition.dupLineRatioCompute($c)")

  override protected def withNewChildInternal(newChild: Expression): DupLineRatioExpr =
    copy(child = newChild)

  override def prettyName: String = "dup_line_ratio"
}

/** See [[NgramRepetition]]. `topNs`/`dupNs` are compile-time config,
  * not child expressions — they land in the generated code as a
  * referenced object. */
case class NgramRepetitionExpr(child: Expression, topNs: Seq[Int], dupNs: Seq[Int])
    extends UnaryExpression {

  require(topNs.nonEmpty || dupNs.nonEmpty, "ngram_repetition wants at least one n")
  require((topNs ++ dupNs).forall(_ >= 2), s"ngram_repetition wants n >= 2, got ${topNs ++ dupNs}")
  require(topNs.distinct == topNs && dupNs.distinct == dupNs,
    "ngram_repetition wants distinct ns per family")
  // the r16 rolling-hash extension walks each family list ascending
  // (shared rolling hash rolls n upward; the numToks >= famN(f) early
  // exit assumes later families need MORE tokens) — unsorted input
  // would return silently wrong fractions, not an error (ADVICE r16)
  require(topNs.sorted == topNs && dupNs.sorted == dupNs,
    s"ngram_repetition wants each family's ns sorted ascending, " +
      s"got topNs=$topNs dupNs=$dupNs")

  private val topArr = topNs.toArray
  private val dupArr = dupNs.toArray

  override def dataType: DataType = StructType(
    topNs.map(n => StructField(s"top_${n}gram_frac", DoubleType, nullable = false)) ++
      dupNs.map(n => StructField(s"dup_${n}gram_frac", DoubleType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ngram_repetition needs string, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    NgramRepetition.compute(input.asInstanceOf[UTF8String], topArr, dupArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val top = ctx.addReferenceObj("topNs", topArr, "int[]")
    val dup = ctx.addReferenceObj("dupNs", dupArr, "int[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.NgramRepetition.compute($c, $top, $dup)")
  }

  override protected def withNewChildInternal(newChild: Expression): NgramRepetitionExpr =
    copy(child = newChild)

  override def prettyName: String = "ngram_repetition"
}
