package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Distinct 52-bit n-gram hashes of a text column in ONE codegen'd
  * pass — the fused twin of
  * `hash52[Fast](explode(Shingles.shingles(text, n)))` that the KMV
  * drift operators feed their sketch aggregate.
  *
  * Why: the unfused pipeline MATERIALIZES every distinct n-gram as a
  * string (StringBuilder + UTF8String per gram, a LinkedHashSet of
  * strings per document) only to hash it and throw it away — at 10M
  * documents that is ~10s of pure allocation per snapshot side before
  * the hash even runs. This kernel tokenizes once ([[Tok.splitWs]]),
  * converts each TOKEN to UTF-8 bytes once, assembles each gram's
  * bytes in a reusable scratch buffer (identical bytes to the joined
  * string: single 0x20 separators) and hashes in place:
  *
  *   - fast mode: `xxhash64(gram, seed 42) >>> 12` — bit-identical to
  *     [[KmvSketch.hash52Fast]] (Spark's XxHash64 over the gram's
  *     UTF-8 bytes with the default seed).
  *   - portable mode: the first 52 bits of `md5(gram)` — bit-identical
  *     to [[KmvSketch.hash52]] (`conv(substr(md5, 1, 13), 16, 10)`:
  *     13 hex chars = the digest's first 6.5 bytes).
  *
  * Output order is first occurrence; distinctness is BY HASH VALUE,
  * which for a KMV sketch consumer is exactly equivalent to the
  * unfused distinct-by-string pipeline: the sketch's own inserts
  * dedupe by value, so two grams colliding to one hash contribute one
  * sketch entry on either path. (Do NOT use this where gram identity
  * matters — that is [[Shingles]]'s job.) Equivalence of the resulting
  * SKETCH is pinned in OpsSpec against the unfused pipeline; the
  * q_ngram_novelty_approx DuckDB oracle replays the portable mode
  * end-to-end.
  */
object ShingleHash {

  /** Also called from generated code. */
  def compute(s: UTF8String, n: Int, md5Mode: Boolean): ArrayData = {
    val toks = Tok.splitWs(s.trim().toString)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val grams = toks.length - n + 1
    // per-token UTF-8 bytes, once
    val tb = new Array[Array[Byte]](toks.length)
    var i = 0
    var maxLen = 0
    while (i < toks.length) {
      tb(i) = toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      if (tb(i).length > maxLen) maxLen = tb(i).length
      i += 1
    }
    val scratch = new Array[Byte](n * maxLen + (n - 1))
    val md = if (md5Mode) java.security.MessageDigest.getInstance("MD5") else null
    // distinct-by-value open addressing; grams*2 slots, linear probe
    var cap = 4
    while (cap < grams * 2) cap <<= 1
    val mask = cap - 1
    val slots = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val out = new Array[Any](grams)
    var found = 0
    var g = 0
    while (g < grams) {
      var len = 0
      var j = 0
      while (j < n) {
        if (j > 0) { scratch(len) = ' '; len += 1 }
        val b = tb(g + j)
        System.arraycopy(b, 0, scratch, len, b.length)
        len += b.length
        j += 1
      }
      val v =
        if (md5Mode) {
          md.reset()
          md.update(scratch, 0, len)
          val d = md.digest()
          // first 13 hex chars = first 52 bits of the digest
          ((d(0) & 0xffL) << 44) | ((d(1) & 0xffL) << 36) |
            ((d(2) & 0xffL) << 28) | ((d(3) & 0xffL) << 20) |
            ((d(4) & 0xffL) << 12) | ((d(5) & 0xffL) << 4) |
            ((d(6) & 0xffL) >>> 4)
        } else {
          org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
            scratch, Platform.BYTE_ARRAY_OFFSET, len, 42L) >>> 12
        }
      // insert if unseen
      var idx = (java.lang.Long.hashCode(v) ^ (java.lang.Long.hashCode(v) >>> 16)) & mask
      var done = false
      while (!done) {
        if (!used(idx)) {
          used(idx) = true
          slots(idx) = v
          out(found) = v
          found += 1
          done = true
        } else if (slots(idx) == v) done = true
        else idx = (idx + 1) & mask
      }
      g += 1
    }
    if (found == grams) new GenericArrayData(out)
    else new GenericArrayData(java.util.Arrays.copyOf(
      out.asInstanceOf[Array[AnyRef]], found).asInstanceOf[Array[Any]])
  }

  import org.apache.spark.sql.graft.ColumnBridge

  /** Column API: distinct 52-bit gram hashes; NULL text yields an
    * EMPTY array (matching `shingles(text)`'s convention — the unfused
    * pipeline's explode of an empty array emits nothing, and so does
    * this array's). */
  def of(text: Column, n: Int, md5Mode: Boolean): Column = {
    import org.apache.spark.sql.functions.{coalesce, typedLit}
    coalesce(
      ColumnBridge.column(ShingleHashExpr(ColumnBridge.expression(text), n, md5Mode)),
      typedLit(Seq.empty[Long]))
  }
}

/** See [[ShingleHash.compute]]. */
case class ShingleHashExpr(child: Expression, n: Int, md5Mode: Boolean)
    extends UnaryExpression {

  require(n >= 1, s"shingle_hash wants n >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_hash needs a string column, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    ShingleHash.compute(input.asInstanceOf[UTF8String], n, md5Mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHash.compute($c, $n, $md5Mode)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashExpr =
    copy(child = newChild)

  override def prettyName: String = "shingle_hash"
}
