package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass within-document duplicate-line removal kernel
  * ([[graft.ops.Dedup.dedupLinesInDoc]]'s engine): repeated non-blank
  * lines keep only their FIRST occurrence, all-space lines always
  * survive (document structure). O(lines) via a seen-set — the
  * higher-order-function formulation this replaced was O(lines²)
  * through per-element `array_position` AND a CodegenFallback that
  * split whole-stage codegen at the curation scan; this kernel keeps
  * the scan in one codegen span and evaluates its child (in curate:
  * the whole C4-clean chain) exactly once per document.
  *
  * Blank = every char is ASCII space, matching Spark/DuckDB `trim`
  * (space-only) so the oracle replay stays bit-exact. Splitting is on
  * '\n' with trailing empties kept, matching `split(text, "\n")`. */
object LineDedup {

  /** Also called from generated code. */
  def dedup(text: UTF8String): UTF8String = {
    val s = text.toString
    val parts = s.split("\n", -1)
    if (parts.length <= 1) return text
    val seen = new java.util.HashSet[String](parts.length * 2)
    val sb = new java.lang.StringBuilder(s.length)
    var first = true
    var i = 0
    while (i < parts.length) {
      val p = parts(i)
      if (isAllSpaces(p) || seen.add(p)) {
        if (!first) sb.append('\n')
        sb.append(p)
        first = false
      }
      i += 1
    }
    if (sb.length == s.length) text else UTF8String.fromString(sb.toString)
  }

  private def isAllSpaces(p: String): Boolean = {
    var j = 0
    while (j < p.length) {
      if (p.charAt(j) != ' ') return false
      j += 1
    }
    true
  }

  /** Column API. */
  def of(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(LineDedupExpr(ColumnBridge.expression(text)))
  }
}

/** See [[LineDedup.dedup]]. */
case class LineDedupExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dedup_lines needs string, got ${other.catalogString}")
  }
  override protected def nullSafeEval(input: Any): Any =
    LineDedup.dedup(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LineDedup.dedup($c)")
  override protected def withNewChildInternal(newChild: Expression): LineDedupExpr =
    copy(child = newChild)
  override def prettyName: String = "dedup_lines"
}
