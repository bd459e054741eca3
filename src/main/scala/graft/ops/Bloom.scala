package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Broadcast-able Bloom filters over a key column — the scan-side
  * pre-filter that lets a recurring 100 TB refresh skip the shuffle
  * against its history store for every row the filter proves is new.
  *
  * A Bloom filter has NO false negatives: `mightContain = false` means
  * the key is definitely absent from the set it was built over, so a
  * consumer may treat those rows as "fresh" without any join at all;
  * only the `true` rows (genuine hits + an `fpp` fraction of false
  * positives) need the exact check. Composed this way the filter is
  * semantically transparent — [[Dedup.incrementalDedupBloom]] and
  * [[Dedup.contaminatedIdsBloom]] return bit-identical results to
  * their exact twins, which is what their shared oracle rows pin.
  *
  * Mechanics: keys are hashed to a long with `xxhash64` on BOTH the
  * build and probe side (so callers pass the natural key column and
  * cannot mismatch hashers), the build is Spark's distributed
  * `DataFrameStatFunctions.bloomFilter` (per-partition partial sketches
  * merged on the driver — one scan, no shuffle), and the probe is the
  * codegen'd catalyst `BloomFilterMightContain` predicate over the
  * serialized filter as a binary literal — the same expression Spark's
  * own runtime row-level filtering injects, so the probe stays inside
  * whole-stage codegen and deserializes the filter once per task.
  *
  * Sizing: `optimalNumOfBits(n, fpp)` ≈ n·ln(1/fpp)/ln²2 — 100 M keys
  * at the 0.03 default is ~90 MB, 1 B keys ~900 MB. The serialized
  * filter rides the plan to every task like a broadcast variable;
  * size it for your store and executor headroom (raise `fpp` to
  * shrink it — false positives only cost exact-check work, never
  * correctness).
  */
object Bloom {

  /** Hash convention shared by build and probe. xxhash64 collisions
    * between DISTINCT keys only add to the false-positive rate (they
    * are resolved by the caller's exact check, like any bloom FP).
    * Spark's xxhash64 maps a null input to the SEED (it never returns
    * null), which would make every null key "contain" every other
    * null key — so nulls are made explicit here: they hash to null,
    * are dropped on the build side, and probe null (see
    * [[mightContain]]). */
  private def keyHash(key: Column): Column =
    when(key.isNull, lit(null).cast("long")).otherwise(xxhash64(key))

  /** Build a serialized Bloom filter of every non-null key in
    * `df(key)`. One distributed scan: each partition fills a partial
    * sketch, partials are OR-merged driver-side (the filter is the
    * aggregation state, bounded by `optimalNumOfBits(expectedItems,
    * fpp)` regardless of row count).
    *
    * `expectedItems` should be the (approximate) DISTINCT key count;
    * overshooting wastes bits, undershooting degrades `fpp`
    * gracefully (never correctness). */
  def build(df: DataFrame, key: Column, expectedItems: Long,
      fpp: Double = 0.03): Array[Byte] = {
    require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0, 1), got $fpp")
    val bf = df.select(keyHash(key).as("__h")).na.drop("any", Seq("__h"))
      .stat.bloomFilter("__h", expectedItems, fpp)
    serialize(bf)
  }

  /** The codegen'd membership probe: true if `key` MIGHT be in the
    * set `bloom` was built over, false if it DEFINITELY is not.
    * Returns null for a null key (bloom membership of nothing is not
    * a fact either way) — callers deciding keep/drop on it should
    * wrap in `coalesce(..., lit(false))` to route null keys down
    * their exact path. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      ColumnBridge.expression(keyHash(key))))

  /** Union two filters built with the SAME expectedItems/fpp (bitwise
    * OR of their bit arrays) — the append path for a growing store:
    * merge the new batch's filter instead of rebuilding over all of
    * history. Throws IncompatibleMergeException on mismatched
    * geometry. Saturation note: a filter sized for N keys holding
    * k·N keys has roughly fpp^(1/k)-ish behavior — degraded
    * precision, still zero false negatives, so correctness holds and
    * only exact-check traffic grows; re-size on the next full
    * rebuild. */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val bf = BloomFilter.readFrom(a)
    bf.mergeInPlace(BloomFilter.readFrom(b))
    serialize(bf)
  }

  /** Persist a filter next to its store (any Hadoop-visible scheme —
    * file://, hdfs://, s3a://), so each refresh loads ~megabytes
    * instead of re-scanning the history. */
  def save(spark: SparkSession, bloom: Array[Byte], path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(bloom) finally out.close()
  }

  /** Load a filter persisted by [[save]], validating it deserializes
    * as a sketch BloomFilter before handing the bytes back. */
  def load(spark: SparkSession, path: String): Array[Byte] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val bytes =
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](64 * 1024)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        buf.toByteArray
      } finally in.close()
    BloomFilter.readFrom(bytes) // contract check: fail loudly here, not mid-query
    bytes
  }

  private def serialize(bf: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }
}
