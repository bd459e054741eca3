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

  /** The kernel — also called from generated code. `form` is validated
    * at expression construction; valueOf here is a enum-map lookup. */
  def compute(s: UTF8String, form: String): UTF8String = {
    val str = s.toString
    // fast path: Normalizer.isNormalized is a cheap scan and ~all
    // real-corpus ASCII text is already normalized in every form
    val f = java.text.Normalizer.Form.valueOf(form)
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }

  /** Column API: Unicode-normalize `text` to `form` (NFC, NFD, NFKC,
    * NFKD). Standard null-in-null-out semantics. */
  def unicodeNormalize(text: Column, form: String = "NFKC"): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(NormalizeExpr(ColumnBridge.expression(text), form))
  }

  /** The standard dedup-prep composition: NFKC-normalize, lowercase,
    * replace control characters with spaces, collapse whitespace runs,
    * trim. Everything after the normalization is builtin (codegen'd)
    * Spark SQL, so the whole expression stays in one generated stage. */
  def cleanText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(unicodeNormalize(text, "NFKC")), "\\p{Cntrl}", " "),
      "\\s+", " "))
}

case class NormalizeExpr(child: Expression, form: String) extends UnaryExpression {

  // fail at construction, not per-row inside an executor
  java.text.Normalizer.Form.valueOf(form)

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
    Normalize.compute(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"""graft.functions.Normalize.compute($c, "$form")""")

  override protected def withNewChildInternal(newChild: Expression): NormalizeExpr =
    copy(child = newChild)

  override def prettyName: String = "unicode_normalize"
}
