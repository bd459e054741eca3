package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Scan-side top-n centroid ranking: the kernel behind IVF list
  * assignment and SemDeDup clustering.
  *
  * Why a custom expression: the previous formulation cross-joined
  * every row against the broadcast centroid frame and ranked with a
  * `row_number()` window partitioned by row id — which SHUFFLES
  * corpus x nlist rows, each carrying the full embedding payload
  * (~gigabytes per million vectors), just to pick each row's best
  * centroid. This kernel ranks the (plan-embedded) centroid array in
  * one pass per row: no explosion, no exchange — assignment runs at
  * parquet-scan speed and the embedding never leaves its partition.
  *
  * Output is BIT-IDENTICAL to the window formulation (pinned by the
  * unchanged q_embed_ivf_topk / q_embed_ivf_indexed / q_semdedup
  * DuckDB oracles): similarities are `dot / (norm(v) * norm(c))` with
  * the same left-to-right double accumulation as [[VecOps.dot]], the
  * order is cosine desc with NaN ranked first (Spark's descending
  * double order) and dimension-mismatched centroids last (their
  * cosine is null in the Column form, and desc ordering puts nulls
  * last), ties broken toward the LOWER centroid index — the caller
  * passes centroids sorted by list_id, making that the documented
  * "then list_id" tie-break.
  *
  * Returns the top-n centroid INDICES in rank order (fewer if there
  * are fewer centroids). A null input vector yields null (the caller's
  * explode drops the row — embeddings are non-null by contract).
  */
object TopCentroids {

  /** Also called from generated code. `norms` are the precomputed
    * centroid L2 norms (same left-to-right accumulation). */
  def indices(v: ArrayData, cents: Array[Array[Double]], norms: Array[Double],
      n: Int): ArrayData = {
    val dim = v.numElements()
    var vv = 0.0
    var i = 0
    while (i < dim) { val x = v.getDouble(i); vv += x * x; i += 1 }
    val vnorm = math.sqrt(vv)
    val m = cents.length
    val sims = new Array[Double](m)
    val bad = new Array[Boolean](m) // dimension mismatch -> ranks last
    var c = 0
    while (c < m) {
      val cent = cents(c)
      if (cent.length != dim) bad(c) = true
      else {
        var s = 0.0
        var j = 0
        while (j < dim) { s += v.getDouble(j) * cent(j); j += 1 }
        sims(c) = s / (vnorm * norms(c))
      }
      c += 1
    }
    // strict "a ranks before b": valid before mismatched; among valid,
    // Double.compare desc (NaN largest, exactly Spark's desc order);
    // ties toward the lower index
    def better(a: Int, b: Int): Boolean = {
      if (bad(a) != bad(b)) return !bad(a)
      if (!bad(a)) {
        val cmp = java.lang.Double.compare(sims(a), sims(b))
        if (cmp != 0) return cmp > 0
      }
      a < b
    }
    val k = math.min(n, m)
    val buf = new Array[Int](math.max(k, 1))
    var size = 0
    c = 0
    while (c < m) {
      if (size < k) {
        var p = size
        while (p > 0 && better(c, buf(p - 1))) { buf(p) = buf(p - 1); p -= 1 }
        buf(p) = c
        size += 1
      } else if (k > 0 && better(c, buf(k - 1))) {
        var p = k - 1
        while (p > 0 && better(c, buf(p - 1))) { buf(p) = buf(p - 1); p -= 1 }
        buf(p) = c
      }
      c += 1
    }
    val out = new Array[Any](size)
    i = 0
    while (i < size) { out(i) = buf(i); i += 1 }
    new GenericArrayData(out)
  }

  /** Column API: array<int> of the top-n centroid indices (centroids
    * in the caller's rank-tie order). `vec` must be array<double>. */
  def of(vec: Column, cents: Array[Array[Double]], n: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(TopCentroidsExpr(ColumnBridge.expression(vec), cents, n))
  }
}

/** See [[TopCentroids]]. */
case class TopCentroidsExpr(child: Expression, cents: Array[Array[Double]], n: Int)
    extends UnaryExpression {

  require(n >= 1, s"top_centroids wants n >= 1, got $n")

  @transient private lazy val norms: Array[Double] =
    cents.map { c =>
      var s = 0.0
      var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      math.sqrt(s)
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"top_centroids needs array<double>, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    TopCentroids.indices(input.asInstanceOf[ArrayData], cents, norms, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cs = ctx.addReferenceObj("cents", cents, "double[][]")
    val ns = ctx.addReferenceObj("norms", norms, "double[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TopCentroids.indices($c, $cs, $ns, $n)")
  }

  override protected def withNewChildInternal(newChild: Expression): TopCentroidsExpr =
    copy(child = newChild)

  override def prettyName: String = "top_centroids"
}
