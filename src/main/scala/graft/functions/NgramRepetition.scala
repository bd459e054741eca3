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

  private val Ws = java.util.regex.Pattern.compile("\\s+")

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
    val out = new Array[Any](topNs.length + dupNs.length)
    java.util.Arrays.fill(out.asInstanceOf[Array[AnyRef]], java.lang.Double.valueOf(0.0))

    // tokens(lower(text)) = split(trim(lower(text)), "\\s+"):
    // UTF8String.toLowerCase is exactly Spark's Lower, trim() exactly
    // StringTrim, Pattern.split(str, -1) exactly StringSplit's default.
    val str = sparkTrim(text.toLowerCase).toString
    if (str.isEmpty) return new GenericInternalRow(out) // tokenCount = 0
    val toks = Ws.split(str, -1)
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

    var f = 0
    while (f < topNs.length + dupNs.length) {
      val isTop = f < topNs.length
      val n = if (isTop) topNs(f) else dupNs(f - topNs.length)
      if (numToks >= n) {
        val grams = numToks - n + 1
        // open addressing on a rolling id hash, linear probing, exact
        // verification by id-range compare on every hit (collisions
        // cannot miscount)
        var cap = 4
        while (cap < grams * 2) cap <<= 1
        val mask = cap - 1
        val slotStart = new Array[Int](cap)
        java.util.Arrays.fill(slotStart, -1)
        val slotCount = new Array[Long](cap)
        var s = 0
        while (s < grams) {
          var h = -2128831035
          var k = s
          while (k < s + n) { h = h * 31 + ids(k); k += 1 }
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
        if (isTop) {
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
        out(f) = frac
      }
      f += 1
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
