package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Serializable parameter block for the one-pass hygiene verdict
  * kernel — a flat mirror of the Column-side stage configs
  * ([[graft.ops.Curation.C4Config]],
  * [[graft.ops.QualityFilters.GopherConfig]],
  * [[graft.ops.QualityFilters.RepetitionConfig]], `minQuality`,
  * `languages`). Stage flags off = that stage auto-passes.
  * `repTopNs`/`repDupNs` are sorted ascending with the threshold
  * arrays aligned; `langCodes`/`langWords` are the language-ID
  * stopword lists sorted by code. */
final case class HygieneSpec(
    c4Enabled: Boolean,
    c4MinSentences: Int,
    c4MinWordsPerLine: Int,
    gopherEnabled: Boolean,
    gMinWords: Int,
    gMaxWords: Int,
    gMinMeanWordLen: Double,
    gMaxMeanWordLen: Double,
    gMaxSymbolRatio: Double,
    gMaxBulletRatio: Double,
    gMaxEllipsisRatio: Double,
    gMinAlphaWordRatio: Double,
    gMinStopwordKinds: Int,
    gStopwords: Array[String],
    repEnabled: Boolean,
    repMaxDupLineRatio: Double,
    repTopNs: Array[Int],
    repTopThresholds: Array[Double],
    repDupNs: Array[Int],
    repDupThresholds: Array[Double],
    minQuality: Double,
    languages: Array[String],
    langCodes: Array[String],
    langWords: Array[Array[String]],
    enStopwords: Array[String]) {

  require(gStopwords.length <= 16, "hygiene spec wants <= 16 gopher stopwords")
  require(langCodes.length <= 8, "hygiene spec wants <= 8 language lists")

  /** Word → bitmask lookup shared by the three token-membership scans
    * (language-ID hit counts, quality-score `en` stopword hits, Gopher
    * stopword kinds): bits 0..7 = language list membership (langCodes
    * order), bit 8 = `en` quality stopword, bits 16.. = one-hot Gopher
    * stopword index. Built once per spec (transient — rebuilt after
    * deserialization on first use). */
  @transient lazy val wordBits: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    def add(w: String, bit: Int): Unit = {
      val prev = m.get(w)
      m.put(w, Integer.valueOf(if (prev == null) bit else prev.intValue() | bit))
    }
    var l = 0
    while (l < langCodes.length) {
      langWords(l).foreach(add(_, 1 << l))
      l += 1
    }
    enStopwords.foreach(add(_, 1 << 8))
    var g = 0
    while (g < gStopwords.length) {
      add(gStopwords(g), 1 << (16 + g))
      g += 1
    }
    m
  }
}

/** One-pass corpus-hygiene verdict: which scan-side curation stage —
  * C4 page rules, Gopher document rules, Gopher repetition rules,
  * quality score, language ID — is the FIRST to reject a document
  * (0 = keep).
  *
  * Why this exists: [[graft.ops.Curation.curate]]'s scan ledger is a
  * conjunction of ~20 Column signals, most of which evaluate the
  * C4-cleaned text. Expression trees are trees, not DAGs — every
  * signal carries its OWN copy of the `c4_line_filter` subtree — and
  * Spark's codegen does subexpression elimination inside projections
  * but NOT across filter conjuncts or aggregate update expressions,
  * so the composed filter re-ran the line filter and re-tokenized
  * ~25x per row (measured 2.1 ms/doc at 1M docs: a parquet-scan-speed
  * claim off by ~50x). This kernel runs every stage in one JVM call:
  * the text is cleaned once, tokenized once (plus once lowercased),
  * and each signal reuses the shared arrays; stages short-circuit in
  * curation order.
  *
  * Semantics are bit-identical to the Column-algebra references
  * (`c4Keep`/`gopherKeep`/`repetitionKeep`/`qualityScore >= q`/
  * `langId isin`), pinned by an OpsSpec equivalence sweep and the
  * q_hygiene_verdict DuckDB oracle. The stage indices are the
  * CANONICAL positions (1=c4 .. 5=language) regardless of which
  * stages are enabled, so ledger arithmetic
  * (`verdict == 0 || verdict > i`) is stable across configs.
  */
object Hygiene {

  val PassVerdict = 0
  val C4Stage = 1
  val GopherStage = 2
  val RepetitionStage = 3
  val QualityStage = 4
  val LanguageStage = 5

  private val Lorem = UTF8String.fromString("lorem ipsum")
  private val Brace = UTF8String.fromString("{")
  private val NoTokens = new Array[String](0)

  /** Replicates `round(x, 6)`: Spark's Round on doubles goes through
    * BigDecimal.valueOf + HALF_UP. */
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Non-overlapping leftmost matches of `#|\.\.\.|…` — the Gopher
    * symbol pattern — replicated as a scan: the regex alternation
    * tries `#`, then `...`, then `…` at each position, exactly this
    * loop's order. */
  private def symbolCount(s: String): Int = {
    var n = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '#') { n += 1; i += 1 }
      else if (c == '.' && i + 2 < s.length &&
        s.charAt(i + 1) == '.' && s.charAt(i + 2) == '.') { n += 1; i += 3 }
      else if (c == '…') { n += 1; i += 1 }
      else i += 1
    }
    n
  }

  /** Count of `\p{Punct}` code points — Java POSIX punct is
    * ASCII-only, so supplementary characters can never match and a
    * UTF-16 char scan is exact. */
  private def punctCount(s: String): Int = {
    var n = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if ((c >= '!' && c <= '/') || (c >= ':' && c <= '@') ||
        (c >= '[' && c <= '`') || (c >= '{' && c <= '~')) n += 1
      i += 1
    }
    n
  }

  /** The verdict. Also called from generated code. */
  def verdict(text: UTF8String, s: HygieneSpec): Int = {
    // ---- stage 1: C4 page rules, over the RAW text -------------------
    var clean: UTF8String = text
    if (s.c4Enabled) {
      val r = TextStats.c4LineFilter(text, s.c4MinWordsPerLine)
      val ok = r.getInt(2) >= s.c4MinSentences &&
        !text.toLowerCase.contains(Lorem) && !text.contains(Brace)
      if (!ok) return C4Stage
      clean = r.getUTF8String(0)
    }

    // ---- shared tokenizations over the (possibly cleaned) text -------
    // tokens(text) = split(trim(text), "\s+") with the empty-after-trim
    // guard forcing tokenCount to 0 (trim strips 0x20 only, split keeps
    // leading empties — both quirks must survive).
    val trimmed = clean.trim().toString
    val toks = if (trimmed.isEmpty) NoTokens else Tok.splitWs(trimmed)
    val nToks = toks.length
    // tokens(lower(text)): lower FIRST, then trim, then split.
    val lowTrim = clean.toLowerCase.trim().toString
    val lowToks = if (lowTrim.isEmpty) NoTokens else Tok.splitWs(lowTrim)

    // meanWordLength numerator = length(regexp_replace(trim, "\s+", ""))
    // = total non-whitespace CODE POINTS = sum of token lengths
    var nonWs = 0L
    var i = 0
    while (i < nToks) {
      nonWs += toks(i).codePointCount(0, toks(i).length)
      i += 1
    }
    val meanWordLen = if (nToks == 0) 0.0 else nonWs.toDouble / nToks

    // one membership pass over the lowercased tokens feeds all three
    // word-list scans (gopher stopword kinds, quality `en` hits,
    // language-ID counts) via the spec's word→bitmask lookup
    val langHits = new Array[Int](s.langCodes.length)
    var enHits = 0
    var gopherMask = 0
    val lookup = s.wordBits
    i = 0
    while (i < lowToks.length) {
      val b = lookup.get(lowToks(i))
      if (b != null) {
        val bits = b.intValue()
        var l = 0
        while (l < langHits.length) {
          if ((bits & (1 << l)) != 0) langHits(l) += 1
          l += 1
        }
        if ((bits & (1 << 8)) != 0) enHits += 1
        gopherMask |= (bits >>> 16)
      }
      i += 1
    }

    // ---- stage 2: Gopher document rules ------------------------------
    if (s.gopherEnabled) {
      if (nToks < s.gMinWords || nToks > s.gMaxWords) return GopherStage
      if (meanWordLen < s.gMinMeanWordLen || meanWordLen > s.gMaxMeanWordLen)
        return GopherStage
      val symRatio =
        if (nToks == 0) 0.0 else symbolCount(clean.toString).toDouble / nToks
      if (!(symRatio < s.gMaxSymbolRatio)) return GopherStage
      val ls = TextStats.lineStats(clean)
      val nonBlank = ls.getInt(0)
      val bulletRatio = if (nonBlank == 0) 0.0 else ls.getInt(1).toDouble / nonBlank
      if (!(bulletRatio < s.gMaxBulletRatio)) return GopherStage
      val ellipsisRatio = if (nonBlank == 0) 0.0 else ls.getInt(2).toDouble / nonBlank
      if (!(ellipsisRatio < s.gMaxEllipsisRatio)) return GopherStage
      var alpha = 0
      i = 0
      while (i < nToks) {
        val t = toks(i)
        var j = 0
        var hit = false
        while (!hit && j < t.length) {
          val c = t.charAt(j)
          if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) hit = true
          j += 1
        }
        if (hit) alpha += 1
        i += 1
      }
      val alphaRatio = if (nToks == 0) 0.0 else alpha.toDouble / nToks
      if (alphaRatio < s.gMinAlphaWordRatio) return GopherStage
      if (Integer.bitCount(gopherMask) < s.gMinStopwordKinds) return GopherStage
    }

    // ---- stage 3: Gopher repetition rules ----------------------------
    if (s.repEnabled) {
      if (NgramRepetition.dupLineRatioCompute(clean) > s.repMaxDupLineRatio)
        return RepetitionStage
      if (s.repTopNs.length + s.repDupNs.length > 0) {
        // lowToks IS tokens(lower(clean)) — the exact array
        // NgramRepetition.compute would rebuild (same lower → trim →
        // split chain); passing it skips a second lowercase + split of
        // the document (the kernel profile's single largest cost)
        val r = NgramRepetition.computeFromToks(lowToks, s.repTopNs, s.repDupNs)
        var f = 0
        while (f < s.repTopNs.length) {
          if (r.getDouble(f) > s.repTopThresholds(f)) return RepetitionStage
          f += 1
        }
        var g = 0
        while (g < s.repDupNs.length) {
          if (r.getDouble(s.repTopNs.length + g) > s.repDupThresholds(g))
            return RepetitionStage
          g += 1
        }
      }
    }

    // ---- stage 4: quality score (always on) --------------------------
    val lenScore = math.min(nToks / 20.0, 1.0)
    val cpLen = clean.numChars()
    val punctRatio =
      if (cpLen == 0) 0.0 else punctCount(clean.toString).toDouble / cpLen
    val punctScore = 1.0 - math.min(punctRatio * 5.0, 1.0)
    val stopRatio = if (nToks == 0) 0.0 else enHits.toDouble / nToks
    val stopScore = math.min(stopRatio * 5.0, 1.0)
    val wordLenScore = if (meanWordLen >= 3.0 && meanWordLen <= 10.0) 1.0 else 0.5
    val score =
      round6(lenScore * 0.3 + punctScore * 0.3 + stopScore * 0.2 + wordLenScore * 0.2)
    if (score < s.minQuality) return QualityStage

    // ---- stage 5: language ID ----------------------------------------
    if (s.languages.length > 0) {
      // argmax of per-language hit counts; ties break toward the
      // LARGEST language code (greatest over struct(hits, lang))
      var bestHits = 0
      var bestLang: String = null
      var l = 0
      while (l < s.langCodes.length) {
        val hits = langHits(l)
        if (hits > bestHits ||
          (hits == bestHits && (bestLang == null || s.langCodes(l) > bestLang))) {
          bestHits = hits
          bestLang = s.langCodes(l)
        }
        l += 1
      }
      val lang = if (bestHits > 0) bestLang else "und"
      var ok = false
      var q = 0
      while (!ok && q < s.languages.length) {
        if (s.languages(q) == lang) ok = true
        q += 1
      }
      if (!ok) return LanguageStage
    }

    PassVerdict
  }

  /** Column API: the first-failing-stage verdict (0 = keep). */
  def hygieneVerdictOf(text: Column, spec: HygieneSpec): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(HygieneVerdictExpr(ColumnBridge.expression(text), spec))
  }
}

/** See [[Hygiene.verdict]]. `spec` is config, not a child — it reaches
  * generated code as a referenced object. */
case class HygieneVerdictExpr(child: Expression, spec: HygieneSpec)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"hygiene_verdict needs string, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    Hygiene.verdict(input.asInstanceOf[UTF8String], spec)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sp = ctx.addReferenceObj("hygieneSpec", spec, "graft.functions.HygieneSpec")
    defineCodeGen(ctx, ev, c => s"graft.functions.Hygiene.verdict($c, $sp)")
  }

  override protected def withNewChildInternal(newChild: Expression): HygieneVerdictExpr =
    copy(child = newChild)

  override def prettyName: String = "hygiene_verdict"
}
