package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/** One-pass DSIR document scorer: tokens → unigram + bigram window
  * hashes (the [[WindowHash]] construction at k=1 and k=2) → bucket =
  * pmod(hash, B) → Σ weights(bucket), in a single JVM loop.
  *
  * Why a custom expression: the Column formulation
  * `aggregate(transform(concat(window_hash(t,1), window_hash(t,2)),
  * h -> pmod(h, B)), 0.0, (acc, b) -> acc + element_at(λ, b+1))`
  * is TWO interpreted higher-order functions — per-gram lambda
  * dispatch twice over ~2x tokens per document (HOFs are
  * CodegenFallback). At 1M web docs that interpreted fold dominated
  * the `dsir_1m` scoring pass; the kernel hashes each token once,
  * rolls the bigram hash from the unigram hashes, and reads the
  * weight array directly.
  *
  * BIT-IDENTICAL to the Column fast path (OpsSpec-pinned): token
  * hashes are [[WindowHash]]'s (xx64 of the lowercased token, seed
  * 42; k=2 windows roll as th(i)·B + th(i+1)), buckets use Spark's
  * pmod, and the summation order is the same left-fold order the
  * concat produces — every unigram weight first, then every bigram
  * weight. Empty/one-token documents contribute their unigram terms
  * only; an empty token array scores 0.0 (the empty sum).
  */
object DsirScore {

  /** Also called from generated code. */
  def score(toks: ArrayData, weights: Array[Double]): Double = {
    val b = weights.length
    val n = toks.numElements()
    if (n == 0) return 0.0
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) =
        if (toks.isNullAt(i)) 0L
        else XXH64.hashUTF8String(toks.getUTF8String(i).toLowerCase, 42L)
      i += 1
    }
    var sum = 0.0
    i = 0
    while (i < n) { sum += weights(pmod(th(i), b)); i += 1 }
    i = 0
    while (i < n - 1) {
      sum += weights(pmod(th(i) * WindowHash.B + th(i + 1), b))
      i += 1
    }
    sum
  }

  /** Spark's pmod on (long, int), inlined. */
  private[functions] def pmod(a: Long, m: Int): Int = {
    val r = (a % m).toInt
    if (r < 0) r + m else r
  }

  /** The bucket ids themselves (unigrams first, then bigrams — the
    * concat order), for the distribution-fit explode. Also called from
    * generated code. Same hashing as [[score]]; factored so the fit
    * and the scoring can never disagree on bucket assignment. */
  def buckets(toks: ArrayData, b: Int): ArrayData = {
    val n = toks.numElements()
    if (n == 0)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(new Array[Int](0))
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) =
        if (toks.isNullAt(i)) 0L
        else XXH64.hashUTF8String(toks.getUTF8String(i).toLowerCase, 42L)
      i += 1
    }
    // primitive-backed UnsafeArrayData: ~240 bucket ids per web doc —
    // a boxed Array[Any] here allocated 240 Integers per document
    val out = new Array[Int](2 * n - 1)
    i = 0
    while (i < n) { out(i) = pmod(th(i), b); i += 1 }
    i = 0
    while (i < n - 1) {
      out(n + i) = pmod(th(i) * WindowHash.B + th(i + 1), b)
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  /** md5-portable scorer — the oracle-path twin of [[score]]. Bucket =
    * top-60-bits-of-md5(gram) mod B, exactly the Column formulation
    * `pmod(conv(substring(md5(g),1,15),16,10), B)` over the
    * unigram+bigram surface forms (bigram digests are streamed as
    * tokA + ' ' + tokB — the concatenated string is never built).
    * Same unigrams-then-bigrams summation order; bit-identical to the
    * interpreted fold (OpsSpec-pinned). Also called from generated
    * code. */
  def md5Score(toks: ArrayData, weights: Array[Double]): Double = {
    val b = weights.length
    val n = toks.numElements()
    if (n == 0) return 0.0
    val md = java.security.MessageDigest.getInstance("MD5")
    val tb = tokenBytes(toks, n)
    var sum = 0.0
    var i = 0
    while (i < n) {
      md.reset(); md.update(tb(i))
      sum += weights((top60(md.digest()) % b).toInt)
      i += 1
    }
    i = 0
    while (i < n - 1) {
      md.reset(); md.update(tb(i)); md.update(' '.toByte); md.update(tb(i + 1))
      sum += weights((top60(md.digest()) % b).toInt)
      i += 1
    }
    sum
  }

  /** md5-portable bucket ids (unigrams first, then bigrams). Also
    * called from generated code. */
  def md5Buckets(toks: ArrayData, b: Int): ArrayData = {
    val n = toks.numElements()
    if (n == 0)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(new Array[Int](0))
    val md = java.security.MessageDigest.getInstance("MD5")
    val tb = tokenBytes(toks, n)
    val out = new Array[Int](2 * n - 1)
    var i = 0
    while (i < n) {
      md.reset(); md.update(tb(i))
      out(i) = (top60(md.digest()) % b).toInt
      i += 1
    }
    i = 0
    while (i < n - 1) {
      md.reset(); md.update(tb(i)); md.update(' '.toByte); md.update(tb(i + 1))
      out(n + i) = (top60(md.digest()) % b).toInt
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  private def tokenBytes(toks: ArrayData, n: Int): Array[Array[Byte]] = {
    val tb = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      // null tokens cannot come out of the filtered split; hash empty
      // bytes rather than throw on adversarial input
      tb(i) =
        if (toks.isNullAt(i)) Array.emptyByteArray
        else toks.getUTF8String(i).getBytes
      i += 1
    }
    tb
  }

  /** First 15 hex chars of the digest as a (nonnegative) 60-bit long —
    * bytes 0-6 whole plus the high nibble of byte 7, matching
    * `conv(substring(md5hex, 1, 15), 16, 10)`. */
  private def top60(digest: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (digest(i) & 0xffL); i += 1 }
    (v << 4) | ((digest(7) & 0xffL) >>> 4)
  }

  /** Column API: double DSIR log-weight of a token array. */
  def of(tokens: Column, weights: Array[Double], md5: Boolean = false): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(DsirScoreExpr(ColumnBridge.expression(tokens), weights, md5))
  }

  /** Column API: array<int> of unigram+bigram bucket ids. */
  def bucketsOf(tokens: Column, b: Int, md5: Boolean = false): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(DsirBucketsExpr(ColumnBridge.expression(tokens), b, md5))
  }
}

/** See [[DsirScore]]. `weights` is plan data (compared by reference in
  * expression equality — two scorers only canonicalize together when
  * they share the array instance, which is how [[graft.ops.Dsir]]
  * builds them). `md5` selects the portable hasher. */
case class DsirScoreExpr(child: Expression, weights: Array[Double],
    md5: Boolean) extends UnaryExpression {

  require(weights.nonEmpty, "dsir_score wants a non-empty weight array")

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"dsir_score needs array<string>, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    if (md5) DsirScore.md5Score(input.asInstanceOf[ArrayData], weights)
    else DsirScore.score(input.asInstanceOf[ArrayData], weights)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("weights", weights, "double[]")
    val fn = if (md5) "md5Score" else "score"
    defineCodeGen(ctx, ev, c => s"graft.functions.DsirScore.$fn($c, $w)")
  }

  override protected def withNewChildInternal(newChild: Expression): DsirScoreExpr =
    copy(child = newChild)

  override def prettyName: String = "dsir_score"
}

/** See [[DsirScore.buckets]] / [[DsirScore.md5Buckets]]. */
case class DsirBucketsExpr(child: Expression, b: Int, md5: Boolean)
    extends UnaryExpression {

  require(b >= 1, s"dsir_buckets wants b >= 1, got $b")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"dsir_buckets needs array<string>, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    if (md5) DsirScore.md5Buckets(input.asInstanceOf[ArrayData], b)
    else DsirScore.buckets(input.asInstanceOf[ArrayData], b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (md5) "md5Buckets" else "buckets"
    defineCodeGen(ctx, ev, c => s"graft.functions.DsirScore.$fn($c, $b)")
  }

  override protected def withNewChildInternal(newChild: Expression): DsirBucketsExpr =
    copy(child = newChild)

  override def prettyName: String = "dsir_buckets"
}
