package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash signature kernel: the k per-seed minima of a
  * shingle array in a single traversal.
  *
  * Why a custom expression: the Column formulation
  * `array((0 until k).map(seed => array_min(transform(sh, s =>
  * hasher(s, seed)))))` runs k SEPARATE higher-order `transform`s per
  * row — HOFs are interpreted (CodegenFallback) with per-element
  * lambda dispatch, and at the LSH calibration for threshold 0.8
  * (k=60) the signature pass alone measured ~23-48s over 300k short
  * docs. This kernel hashes each shingle under all k seeds in one JVM
  * loop (~10x).
  *
  * Output values are BIT-IDENTICAL to the Column references — pinned
  * by an OpsSpec equivalence test and the unchanged q_minhash_lsh /
  * q_dedup_minhash_est DuckDB oracles:
  *
  *  - md5 variant = `array_min(transform(sh, s => md5(concat(lit(
  *    s"$seed:"), s))))`: lowercase-hex MD5 of the UTF-8 bytes of
  *    `"<seed>:" + shingle`; `array_min` on hex strings is the binary
  *    UTF8 ordering = byte-wise ASCII ordering replicated here with
  *    plain String.compareTo (hex is ASCII).
  *  - xx64 variant = `array_min(transform(sh, s => xxhash64(
  *    lit(seed), s)))`: Spark chains xxhash64 children from seed 42 —
  *    `XXH64.hashInt(seed, 42)` then `XXH64.hashUTF8String(s, acc)` —
  *    and the per-seed bases are precomputed once.
  *
  * An EMPTY shingle array yields `[null x k]` exactly like
  * `array_min(transform([], ...))` (null per seed) — the
  * shingle-less-doc sentinel the LSH bucketing guards filter on.
  */
object MinHashSig {

  /** md5 variant — also called from generated code. NULL array
    * elements are SKIPPED exactly like the Column form (the hasher
    * maps null -> null and `array_min` ignores nulls); an array of
    * only nulls yields the same [null x k] as an empty one. */
  def md5Sig(sh: ArrayData, k: Int): ArrayData = {
    val out = new Array[Any](k)
    val n = sh.numElements()
    if (n == 0) return new GenericArrayData(out) // [null x k]
    val md = java.security.MessageDigest.getInstance("MD5")
    val mins = new Array[String](k)
    var i = 0
    while (i < n) {
      if (!sh.isNullAt(i)) {
        val bytes = sh.getUTF8String(i).getBytes
        var seed = 0
        while (seed < k) {
          md.reset()
          md.update(String.valueOf(seed).getBytes(
            java.nio.charset.StandardCharsets.US_ASCII))
          md.update(':'.toByte)
          md.update(bytes)
          val hex = toHex(md.digest())
          if (mins(seed) == null || hex.compareTo(mins(seed)) < 0) mins(seed) = hex
          seed += 1
        }
      }
      i += 1
    }
    var s = 0
    while (s < k) {
      // mins stays null when every element was null — [null x k]
      out(s) = if (mins(s) == null) null else UTF8String.fromString(mins(s))
      s += 1
    }
    new GenericArrayData(out)
  }

  private val HexChars = "0123456789abcdef".toCharArray

  private def toHex(b: Array[Byte]): String = {
    val c = new Array[Char](b.length * 2)
    var i = 0
    while (i < b.length) {
      val v = b(i) & 0xff
      c(i * 2) = HexChars(v >>> 4)
      c(i * 2 + 1) = HexChars(v & 0x0f)
      i += 1
    }
    new String(c)
  }

  /** xx64 variant — also called from generated code. `seedBases` are
    * the precomputed `XXH64.hashInt(seed, 42L)` chain heads. */
  def xxSig(sh: ArrayData, seedBases: Array[Long]): ArrayData = {
    val k = seedBases.length
    val out = new Array[Any](k)
    val n = sh.numElements()
    if (n == 0) return new GenericArrayData(out) // [null x k]
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      // a NULL element is NOT skipped: Spark's xxhash64 folds null
      // children as "leave the accumulator alone", so
      // xxhash64(lit(seed), null) = the seed chain head itself — it
      // participates in the min with exactly that value
      if (sh.isNullAt(i)) {
        var seed = 0
        while (seed < k) {
          if (seedBases(seed) < mins(seed)) mins(seed) = seedBases(seed)
          seed += 1
        }
      } else {
        val s = sh.getUTF8String(i)
        var seed = 0
        while (seed < k) {
          val h = XXH64.hashUTF8String(s, seedBases(seed))
          if (h < mins(seed)) mins(seed) = h
          seed += 1
        }
      }
      i += 1
    }
    var s = 0
    while (s < k) { out(s) = mins(s); s += 1 }
    new GenericArrayData(out)
  }

  /** Column API: md5 minhash signature (array<string>). */
  def md5SigOf(shingles: Column, k: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(MinHashSigExpr(ColumnBridge.expression(shingles), k, md5 = true))
  }

  /** Column API: xxhash64 minhash signature (array<bigint>). */
  def xxSigOf(shingles: Column, k: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(MinHashSigExpr(ColumnBridge.expression(shingles), k, md5 = false))
  }
}

/** See [[MinHashSig]]. */
case class MinHashSigExpr(child: Expression, k: Int, md5: Boolean)
    extends UnaryExpression {

  require(k >= 1, s"minhash_sig wants k >= 1, got $k")

  @transient private lazy val seedBases: Array[Long] =
    (0 until k).map(s => XXH64.hashInt(s, 42L)).toArray

  override def dataType: DataType =
    ArrayType(if (md5) StringType else LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_sig needs array<string>, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val sh = input.asInstanceOf[ArrayData]
    if (md5) MinHashSig.md5Sig(sh, k) else MinHashSig.xxSig(sh, seedBases)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (md5)
      defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSig.md5Sig($c, $k)")
    else {
      val sb = ctx.addReferenceObj("seedBases", seedBases, "long[]")
      defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSig.xxSig($c, $sb)")
    }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}
