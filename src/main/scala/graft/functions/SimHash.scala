package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over a token array — a custom Catalyst `Expression`
  * (no UDF): per token a 64-bit hash votes ±1 on each bit position;
  * the fingerprint sets bit j iff the vote sum is positive. Documents
  * with small Hamming distance between fingerprints are near-dups.
  *
  * Implemented as a native expression with `doGenCode` delegating to a
  * static kernel — the codegen'd call avoids the interpreted-row path
  * and keeps the surrounding projection inside whole-stage codegen
  * (a Scala UDF here would force an extra serialization boundary).
  *
  * The token hash is two Murmur3 x86-32 rounds (seeds 0x9747b28c and
  * 0x altered) combined into 64 bits — deterministic across JVMs,
  * partitions and Spark versions (no dependence on String.hashCode).
  */
object SimHash {

  private val Seed1 = 0x9747b28c
  private val Seed2 = 0x85ebca6b

  /** The kernel — also called from generated code. */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val base = s.getBaseObject
        val off = s.getBaseOffset
        val len = s.numBytes()
        val h1 = Murmur3_x86_32.hashUnsafeBytes(base, off, len, Seed1)
        val h2 = Murmur3_x86_32.hashUnsafeBytes(base, off, len, Seed2)
        val h = (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** Column API: simhash64 of an array<string> of tokens. */
  def simhash64(tokens: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(SimHash64Expr(ColumnBridge.expression(tokens)))
  }

  // MessageDigest is stateful and not thread-safe; one instance per
  // executor thread, reset per token
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 60-bit md5 kernel — the portable twin of [[compute]]. Per token
    * the hash is the first 15 hex chars of md5 parsed as an integer
    * (= the top 60 bits of the digest's first 8 big-endian bytes),
    * exactly what DuckDB's `('0x'||substr(md5(t),1,15))::BIGINT`
    * yields, so fingerprints replay bit-for-bit in the oracle. Also
    * called from generated code. */
  def computeMd5(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](60)
    val md = md5Local.get()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val digest = md.digest(arr.getUTF8String(i).getBytes)
        var be = 0L
        var k = 0
        while (k < 8) { be = (be << 8) | (digest(k) & 0xffL); k += 1 }
        val h = be >>> 4 // drop the 16th nibble: 15 hex chars = 60 bits
        var j = 0
        while (j < 60) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      } else {
        // a NULL token votes -1 on every bit, matching the SQL
        // formulation this kernel replaced (`when(bit(NULL)===1, 1)
        // .otherwise(-1)` takes the otherwise branch) and DuckDB's
        // `CASE WHEN (NULL >> j) & 1 = 1 THEN 1 ELSE -1 END`
        var j = 0
        while (j < 60) { votes(j) -= 1; j += 1 }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 60) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** Column API: 60-bit md5 simhash of an array<string> of tokens. */
  def simhash60md5(tokens: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(SimHashMd5Expr(ColumnBridge.expression(tokens)))
  }
}

case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 needs array<string>, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    SimHash.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

/** 60-bit md5-portable SimHash (see [[SimHash.computeMd5]]). One
  * codegen'd pass over the token array — replaces the 60 interpreted
  * `aggregate()` higher-order-function passes the portable pipeline
  * previously needed (HOF lambdas never enter whole-stage codegen). */
case class SimHashMd5Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash60md5 needs array<string>, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    SimHash.computeMd5(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash.computeMd5($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashMd5Expr =
    copy(child = newChild)

  override def prettyName: String = "simhash60md5"
}
