package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Non-empty whitespace tokens of a text column in ONE codegen'd pass
  * — the kernel twin of
  * `filter(split(trim(text), "\\s+"), t => length(t) > 0)` (and, with
  * `lower = true`, of the `lower(trim(text))` variant the LM-normal-
  * form operators share).
  *
  * Why: `filter` is a higher-order function — CodegenFallback in
  * Spark, so ONE such tokenization evicts its whole projection from
  * whole-stage codegen — and the `split` under it runs the regex
  * engine plus an intermediate array with the empty edge tokens the
  * filter then drops. The kernel scans for maximal non-`\s` runs
  * (exactly the split+filter result: Java `\s` is the six ASCII chars
  * [[Tok.isWs]] tests) directly off the trimmed (and optionally
  * lowercased) string. Equivalence is fuzz-pinned in PropertySpec
  * against the HOF formulation itself.
  *
  * Used by the ExactSubstr window pass (3 corpus scans per dedup),
  * sequence chunking, DSIR scoring, TF-IDF and token-drift — the
  * operators whose tokenization previously ran interpreted.
  */
object WsTokens {

  /** Also called from generated code. */
  def compute(s: UTF8String, lower: Boolean): ArrayData = {
    val t0 = s.trim() // Spark trim: 0x20 only
    val str = (if (lower) t0.toLowerCase else t0).toString
    val n = str.length
    // count runs first: exact-sized output array
    var runs = 0
    var i = 0
    var inTok = false
    while (i < n) {
      if (Tok.isWs(str.charAt(i))) inTok = false
      else { if (!inTok) runs += 1; inTok = true }
      i += 1
    }
    if (runs == 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](runs)
    var k = 0
    i = 0
    while (i < n) {
      if (!Tok.isWs(str.charAt(i))) {
        var j = i + 1
        while (j < n && !Tok.isWs(str.charAt(j))) j += 1
        out(k) = UTF8String.fromString(str.substring(i, j))
        k += 1
        i = j
      } else i += 1
    }
    new GenericArrayData(out)
  }

  /** `size(split(trim(s), "\\s+"))` without materializing the array:
    * token count = whitespace runs + 1 on the trimmed string (limit -1
    * keeps the leading/trailing empty tokens, so the count is exactly
    * runs+1). Also called from generated code. */
  def count(s: UTF8String): Int = {
    val str = s.trim().toString
    var runs = 0
    var i = 0
    var inWs = false
    while (i < str.length) {
      if (Tok.isWs(str.charAt(i))) { if (!inWs) runs += 1; inWs = true }
      else inWs = false
      i += 1
    }
    runs + 1
  }

  import org.apache.spark.sql.graft.ColumnBridge

  /** `filter(split(trim(text), "\\s+"), t => length(t) > 0)`. */
  def of(text: Column): Column =
    ColumnBridge.column(WsTokensExpr(ColumnBridge.expression(text), lower = false))

  /** Exact [[graft.ops.TextAnalysis.tokenCount]]:
    * `when(length(trim(text)) === 0, 0).otherwise(size(split(trim(text),
    * "\\s+")))` — the empty-string guard rides along so callers swap
    * 1:1; null in, null out on both forms (ANSI size(NULL) = NULL). */
  def countOf(text: Column): Column = {
    import org.apache.spark.sql.functions.{length, lit, trim, when}
    when(length(trim(text)) === 0, 0)
      .otherwise(ColumnBridge.column(
        WsTokenCountExpr(ColumnBridge.expression(text))))
  }

  /** `filter(split(lower(trim(text)), "\\s+"), t => length(t) > 0)`. */
  def lowerOf(text: Column): Column =
    ColumnBridge.column(WsTokensExpr(ColumnBridge.expression(text), lower = true))
}

/** See [[WsTokens.compute]]. */
case class WsTokensExpr(child: Expression, lower: Boolean) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ws_tokens needs a string column, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    WsTokens.compute(input.asInstanceOf[UTF8String], lower)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WsTokens.compute($c, $lower)")

  override protected def withNewChildInternal(newChild: Expression): WsTokensExpr =
    copy(child = newChild)

  override def prettyName: String = "ws_tokens"
}

/** See [[WsTokens.count]]. */
case class WsTokenCountExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ws_token_count needs a string column, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    WsTokens.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WsTokens.count($c)")

  override protected def withNewChildInternal(newChild: Expression): WsTokenCountExpr =
    copy(child = newChild)

  override def prettyName: String = "ws_token_count"
}
