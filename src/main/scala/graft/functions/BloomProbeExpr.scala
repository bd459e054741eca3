package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.types.LongType
import org.apache.spark.util.sketch.BloomFilter

/** Broadcast-backed Bloom membership probe over a pre-hashed long key.
  *
  * Spark's own `BloomFilterMightContain` carries the serialized filter
  * as a foldable expression — a LITERAL in the plan tree. That is fine
  * for the optimizer-injected runtime filters it was built for (their
  * size is conf-capped at 8 MB), but a history store's filter is tens
  * to hundreds of MB at 100 TB scale, and a literal that size is
  * shipped inside EVERY task binary of every stage that probes it and
  * re-hashed by every driver-side plan canonicalization
  * (measured: +2-8 s per job at just 8 MB). This expression references
  * the filter through a `Broadcast` instead: torrent-distributed once
  * per executor, deserialized once, a pointer thereafter — while
  * keeping the same whole-stage-codegen probe (`mightContainLong` on
  * the pre-hashed key).
  *
  * Null long (null key upstream) probes null, matching
  * [[graft.ops.Bloom.mightContain]]'s literal form.
  */
case class BloomProbeExpr(bloom: Broadcast[BloomFilter], child: Expression)
    extends UnaryExpression with Predicate {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain probes a pre-hashed bigint key, got ${t.catalogString}")
  }

  override protected def nullSafeEval(h: Any): Any =
    bloom.value.mightContainLong(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcastCls = classOf[Broadcast[_]].getName
    val filterCls = classOf[BloomFilter].getName
    val bc = ctx.addReferenceObj("bloomBcast", bloom, bcastCls)
    // resolve broadcast.value() once per task, not once per row
    val filterVar = ctx.addMutableState(filterCls, "bloomFilter",
      v => s"$v = ($filterCls) $bc.value();")
    nullSafeCodeGen(ctx, ev, h => s"${ev.value} = $filterVar.mightContainLong($h);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomProbeExpr =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain"
}
