package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lower, regexp_replace, trim}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization for text columns — the canonical first step
  * of a dedup pipeline: "café" composed and "cafe" + U+0301 decomposed
  * are different byte strings (different fingerprints, shingles, and
  * hash buckets) until normalized; NFKC additionally folds
  * compatibility forms (ﬁ → fi, fullwidth Ａ → A, ² → 2) that web
  * corpora are full of.
  *
  * Why a custom expression: Spark ships no normalization builtin, and
  * a Scala UDF would break whole-stage codegen on the hottest scan
  * path in the pipeline. The kernel is `java.text.Normalizer` (the
  * JDK's ICU-derived implementation of UAX #15) wrapped in a
  * codegen'd [[UnaryExpression]] — same tier as [[SimHash64Expr]].
  */
object Normalize {

  /** The kernel — also called from generated code (which references
    * the Form enum constant directly, so nothing string-resolves per
    * row). Invalid UTF-8 is sanitized (U+FFFD) on EVERY path: the
    * fast path may only hand back the original bytes when they are
    * valid, else two canonically-equivalent inputs sharing an invalid
    * byte tail would normalize to different byte strings (the
    * original on the already-normalized path, a sanitized re-encoding
    * on the other) — and different bytes mean different fingerprints,
    * the exact dedup miss this function exists to prevent. */
  def compute(s: UTF8String, f: java.text.Normalizer.Form): UTF8String = {
    val str = s.toString // replaces malformed sequences with U+FFFD
    // fast path: isNormalized is a cheap scan and ~all real-corpus
    // ASCII text is already normalized in every form
    if (java.text.Normalizer.isNormalized(str, f)) {
      if (s.isValid) s else UTF8String.fromString(str)
    } else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }

  /** Column API: Unicode-normalize `text` to `form` (NFC, NFD, NFKC,
    * NFKD). Standard null-in-null-out semantics. */
  def unicodeNormalize(text: Column, form: String = "NFKC"): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(NormalizeExpr(ColumnBridge.expression(text), form))
  }

  /** The standard dedup-prep composition: NFKC-normalize, lowercase,
    * DELETE format characters (Cf: zero-width spaces/joiners, soft
    * hyphens — the invisible junk web text is full of, which NFKC
    * deliberately preserves; deleted rather than spaced so soft-
    * hyphenated words rejoin), replace control characters with spaces,
    * collapse whitespace runs, trim. Everything after the
    * normalization is builtin (codegen'd) Spark SQL, so the whole
    * expression stays in one generated stage. */
  def cleanText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(lower(unicodeNormalize(text, "NFKC")), "\\p{Cf}", ""),
        "\\p{Cntrl}", " "),
      "\\s+", " "))
}

case class NormalizeExpr(child: Expression, form: String) extends UnaryExpression {

  // fail at construction, not per-row inside an executor; the resolved
  // enum is re-derived lazily after deserialization so the per-row
  // path never string-resolves the form
  java.text.Normalizer.Form.valueOf(form)
  @transient private lazy val resolvedForm = java.text.Normalizer.Form.valueOf(form)

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"unicode_normalize needs a string column, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    Normalize.compute(input.asInstanceOf[UTF8String], resolvedForm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Normalize.compute($c, java.text.Normalizer.Form.$form)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeExpr =
    copy(child = newChild)

  override def prettyName: String = "unicode_normalize"
}
