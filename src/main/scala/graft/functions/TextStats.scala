package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen kernels for the scan-side text signals whose Column-algebra
  * formulations use higher-order-function lambdas (`filter`) — HOFs are
  * CodegenFallback in Spark, and ONE fallback expression evicts the
  * entire projection from whole-stage codegen. With these kernels the
  * full corpus-hygiene scan pass ([[graft.ops.Curation.curate]]'s
  * ledger projection: Gopher + repetition + quality + language) stays
  * inside one codegen'd stage.
  *
  * Every kernel replicates its Column reference bit-for-bit (pinned by
  * OpsSpec equivalence tests and the unchanged q_text_stats /
  * q_lang_id / q_quality_gopher DuckDB oracles): Spark's `trim` strips
  * 0x20 only, `split` keeps trailing empty strings (limit -1), `rlike`
  * is Java-regex `Matcher.find`, and `length` counts code points.
  */
object TextStats {

  /** Replicates `trim(s)`: leading/trailing 0x20 only. */
  private def trimSpaces(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    s.substring(a, b)
  }

  /** Line-family signals in one pass over `split(text, "\n")`:
    * (non-blank lines, bullet lines, ellipsis lines) where non-blank =
    * `length(trim(l)) > 0`, bullet = `trim(l) rlike "^[-*•]"`,
    * ellipsis = `trim(l) rlike "(\\.\\.\\.|…)$"`. The two regexes are
    * single anchored alternatives, replicated as first-char /
    * suffix tests (lines contain no `\n`, so `^`/`$` are exactly the
    * string ends). Also called from generated code. */
  def lineStats(text: UTF8String): InternalRow = {
    val lines = text.toString.split("\n", -1)
    var nonBlank = 0
    var bullet = 0
    var ellipsis = 0
    var i = 0
    while (i < lines.length) {
      val t = trimSpaces(lines(i))
      if (t.nonEmpty) {
        nonBlank += 1
        val c0 = t.charAt(0)
        if (c0 == '-' || c0 == '*' || c0 == '•') bullet += 1
        if (t.charAt(t.length - 1) == '…' || t.endsWith("...")) ellipsis += 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](nonBlank, bullet, ellipsis))
  }

  /** Count of whitespace tokens containing at least one ASCII letter —
    * the kernel twin of `size(filter(tokens(text), t =>
    * t.rlike("[A-Za-z]")))`. Also called from generated code. */
  def alphaWordCount(text: UTF8String): Int = {
    val str = trimSpaces(text.toString)
    if (str.isEmpty) return 0 // split("") = [""], no letter anyway
    val toks = Tok.splitWs(str)
    var n = 0
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      var j = 0
      var hit = false
      while (!hit && j < t.length) {
        val c = t.charAt(j)
        if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) hit = true
        j += 1
      }
      if (hit) n += 1
      i += 1
    }
    n
  }

  /** Per-language stopword hit counts over `tokens(lower(text))` in
    * ONE tokenization — the kernel twin of N separate
    * `size(filter(toks, t => array_contains(words, t)))` calls.
    * `langWords` rows align with the output struct fields. Also called
    * from generated code. */
  def stopwordCounts(text: UTF8String, langWords: Array[Array[String]]): InternalRow = {
    val out = new Array[Any](langWords.length)
    var l = 0
    while (l < langWords.length) { out(l) = 0; l += 1 }
    val str = trimSpaces(text.toLowerCase.toString)
    if (str.isEmpty) {
      // tokens = [""]: no stopword is empty, all counts stay 0
      return new GenericInternalRow(out)
    }
    val toks = Tok.splitWs(str)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      l = 0
      while (l < langWords.length) {
        val words = langWords(l)
        var w = 0
        var hit = false
        while (!hit && w < words.length) {
          if (words(w) == t) hit = true
          w += 1
        }
        if (hit) out(l) = out(l).asInstanceOf[Int] + 1
        l += 1
      }
      i += 1
    }
    new GenericInternalRow(out)
  }

  private val BpeSplit =
    java.util.regex.Pattern.compile("(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])")
  private val AllWs = java.util.regex.Pattern.compile("^\\s+$")

  /** BPE-flavored token estimate — kernel twin of the HOF
    * `size(filter(split(text, BpeSplit), t => length(t) > 0 &&
    * !t.rlike("^\\s+$")))`: letter/digit runs and single punctuation
    * marks count, whitespace fragments don't. Uses the IDENTICAL Java
    * patterns (including `$`-before-trailing-newline semantics), so
    * equivalence is by construction. Also called from generated
    * code. */
  def bpeTokenCount(text: UTF8String): Int = {
    val toks = BpeSplit.split(text.toString, -1)
    var n = 0
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty && !AllWs.matcher(t).find()) n += 1
      i += 1
    }
    n
  }

  /** C4 line filtering in one pass: a line is kept iff non-blank, its
    * trimmed form ends in terminal punctuation, and it has at least
    * `minWords` whitespace tokens. Returns (kept lines rejoined with
    * `\n` — the RAW untrimmed lines, like the Column reference —
    * kept-line count, terminal-punct count of the kept text). The
    * sentence proxy counts `[.!?]` occurrences per kept line, which
    * equals `regexp_extract_all` over the joined text because the join
    * separator contains none of them. Also called from generated
    * code. */
  /** `\s` per Java regex (the split class the token counts replicate). */
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Token count of one LINE exactly like `Ws.split(t, -1).length`
    * (negative limit keeps leading AND trailing empty tokens, so the
    * count is simply 1 + number of whitespace runs). Lines contain no
    * `\n`; `t` is non-empty. */
  private def lineWordCount(t: String): Int = {
    var runs = 0
    var inWs = false
    var i = 0
    while (i < t.length) {
      if (isWs(t.charAt(i))) { if (!inWs) runs += 1; inWs = true }
      else inWs = false
      i += 1
    }
    runs + 1
  }

  def c4LineFilter(text: UTF8String, minWords: Int): InternalRow = {
    val lines = text.toString.split("\n", -1)
    val sb = new java.lang.StringBuilder()
    var kept = 0
    var sent = 0
    var i = 0
    while (i < lines.length) {
      val raw = lines(i)
      val t = trimSpaces(raw)
      // Terminal = "[.!?\"]$": a single anchored char class — the last
      // char test is exact (no \n inside a line)
      if (t.nonEmpty && {
          val lc = t.charAt(t.length - 1)
          lc == '.' || lc == '!' || lc == '?' || lc == '"'
        } && lineWordCount(t) >= minWords) {
        if (kept > 0) sb.append('\n')
        sb.append(raw)
        kept += 1
        var j = 0
        while (j < raw.length) {
          val c = raw.charAt(j)
          if (c == '.' || c == '!' || c == '?') sent += 1
          j += 1
        }
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](UTF8String.fromString(sb.toString), kept, sent))
  }

  import org.apache.spark.sql.graft.ColumnBridge

  /** Column API: struct(non_blank, bullet, ellipsis) line counts. */
  def lineStatsOf(text: Column): Column =
    ColumnBridge.column(LineStatsExpr(ColumnBridge.expression(text)))

  /** Column API: count of tokens containing an ASCII letter. */
  def alphaWordCountOf(text: Column): Column =
    ColumnBridge.column(AlphaWordCountExpr(ColumnBridge.expression(text)))

  /** Column API: struct of per-language stopword hit counts; field
    * names are the language codes, in the given order. */
  def stopwordCountsOf(text: Column, langs: Seq[(String, Seq[String])]): Column =
    ColumnBridge.column(StopwordCountsExpr(ColumnBridge.expression(text),
      langs.map(_._1), langs.map(_._2)))

  /** Column API: struct(kept_text, n_kept, n_sentences) of the C4
    * line filter. */
  def c4LineFilterOf(text: Column, minWords: Int): Column =
    ColumnBridge.column(C4LineFilterExpr(ColumnBridge.expression(text), minWords))

  /** Column API: BPE-flavored token count. */
  def bpeTokenCountOf(text: Column): Column =
    ColumnBridge.column(BpeTokenCountExpr(ColumnBridge.expression(text)))
}

/** See [[TextStats.bpeTokenCount]]. */
case class BpeTokenCountExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_token_count needs string, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    TextStats.bpeTokenCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStats.bpeTokenCount($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCountExpr =
    copy(child = newChild)

  override def prettyName: String = "bpe_token_count"
}

/** See [[TextStats.c4LineFilter]]. */
case class C4LineFilterExpr(child: Expression, minWords: Int) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("kept_text", StringType, nullable = false),
    StructField("n_kept", IntegerType, nullable = false),
    StructField("n_sentences", IntegerType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"c4_line_filter needs string, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    TextStats.c4LineFilter(input.asInstanceOf[UTF8String], minWords)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStats.c4LineFilter($c, $minWords)")

  override protected def withNewChildInternal(newChild: Expression): C4LineFilterExpr =
    copy(child = newChild)

  override def prettyName: String = "c4_line_filter"
}

/** See [[TextStats.lineStats]]. */
case class LineStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("non_blank", IntegerType, nullable = false),
    StructField("bullet", IntegerType, nullable = false),
    StructField("ellipsis", IntegerType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"line_stats needs string, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    TextStats.lineStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStats.lineStats($c)")

  override protected def withNewChildInternal(newChild: Expression): LineStatsExpr =
    copy(child = newChild)

  override def prettyName: String = "line_stats"
}

/** See [[TextStats.alphaWordCount]]. */
case class AlphaWordCountExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"alpha_word_count needs string, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    TextStats.alphaWordCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStats.alphaWordCount($c)")

  override protected def withNewChildInternal(newChild: Expression): AlphaWordCountExpr =
    copy(child = newChild)

  override def prettyName: String = "alpha_word_count"
}

/** See [[TextStats.stopwordCounts]]. `langs`/`words` are config, not
  * children — they reach generated code as a referenced object. */
case class StopwordCountsExpr(child: Expression, langs: Seq[String],
    words: Seq[Seq[String]]) extends UnaryExpression {

  require(langs.nonEmpty && langs.length == words.length,
    s"stopword_counts wants aligned langs/words, got $langs")

  private val wordsArr: Array[Array[String]] = words.map(_.toArray).toArray

  override def dataType: DataType = StructType(
    langs.map(l => StructField(l, IntegerType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"stopword_counts needs string, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    TextStats.stopwordCounts(input.asInstanceOf[UTF8String], wordsArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("stopwords", wordsArr, "java.lang.String[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStats.stopwordCounts($c, $w)")
  }

  override protected def withNewChildInternal(newChild: Expression): StopwordCountsExpr =
    copy(child = newChild)

  override def prettyName: String = "stopword_counts"
}
