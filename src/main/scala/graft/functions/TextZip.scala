package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deflate-size kernel behind the compression-ratio quality signal
  * (the RedPajama-v2 / CCNet-family heuristic): highly repetitive
  * pages — templates, keyword stuffing, log spam — compress far below
  * normal prose, while high-entropy junk (minified blobs, encoded
  * binaries) barely compresses at all, so the ratio
  * `deflated_bytes / raw_bytes` separates both tails from natural
  * text with ONE pass and no model. zlib output is deterministic for
  * a fixed level/strategy/input, so the signal is replayable across
  * runs and cluster layouts (it has no SQL analog in the oracle
  * engine — pinned by ScalaTest instead, like the murmur3 SimHash).
  */
object TextZip {

  // one Deflater per executor thread, reset per row — allocating one
  // per row costs more than the compression itself on short documents
  private val local: ThreadLocal[java.util.zip.Deflater] =
    ThreadLocal.withInitial(() =>
      new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true))

  /** Compressed (raw-deflate) size in bytes of the UTF-8 text. Also
    * called from generated code. */
  def deflateSize(s: UTF8String): Int = {
    val bytes = s.getBytes
    val d = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  /** Compressed size in bytes (int; null on null input). */
  def deflateSizeCol(text: Column): Column =
    ColumnBridge.column(DeflateSizeExpr(ColumnBridge.expression(text)))
}

case class DeflateSizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"deflate_size needs a string column, got ${t.catalogString}")
  }

  override protected def nullSafeEval(s: Any): Any =
    TextZip.deflateSize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.TextZip.deflateSize($s)")

  override protected def withNewChildInternal(newChild: Expression): DeflateSizeExpr =
    copy(child = newChild)

  override def prettyName: String = "deflate_size"
}
