package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: per-piece timing of the Bloom pre-filter path against a
  * persisted fingerprint store — where do the incremental-dedup bloom
  * row's seconds go (count / build / probe / semi-join)?
  * `sbt "runMain graft.BloomProbe <storeParquet> <batchParquet>"`
  * (defaults target the Bench incdedup inputs). */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-shuffle")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val storePath = args.headOption.getOrElse(
      sys.error("usage: BloomProbe <storeParquet> [batchParquet]"))
    val store = spark.read.parquet(storePath)
    def t(label: String)(body: => Any): Unit = {
      val s = System.nanoTime; val r = body
      println(f"[probe] $label: ${(System.nanoTime - s) / 1e9}%.2fs -> $r")
    }
    def load(): String = java.nio.file.Files
      .readString(java.nio.file.Paths.get("/proc/loadavg")).trim
    t("store count")(store.count())
    t("store count (warm)")(store.count())
    (1 to 4).foreach { i =>
      println(s"[probe] loadavg ${load()}")
      t(s"bloom build rep$i")(
        graft.ops.Bloom.build(store, col("fingerprint"), 9000000L, 0.03).length)
    }
    val bloom = graft.ops.Bloom.build(store, col("fingerprint"), 9000000L, 0.03)
    t("probe self 9m")(store
      .filter(graft.ops.Bloom.mightContain(bloom, col("fingerprint"))).count())
    t("probe self 9m (warm)")(store
      .filter(graft.ops.Bloom.mightContain(bloom, col("fingerprint"))).count())
    // tiny-literal control: if this is fast, the 8MB literal itself
    // (driver-side tree hashing / task re-serialization) is the cost,
    // not the per-row probe work
    val tiny = graft.ops.Bloom.build(store.limit(1000), col("fingerprint"), 1000L, 0.03)
    t("probe self 9m tiny-bloom")(store
      .filter(graft.ops.Bloom.mightContain(tiny, col("fingerprint"))).count())
    t("probe self 9m tiny-bloom (warm)")(store
      .filter(graft.ops.Bloom.mightContain(tiny, col("fingerprint"))).count())
    // broadcast probe: the production form — no literal in the tree
    val bc = graft.ops.Bloom.broadcastFilter(spark, bloom)
    t("probe self 9m broadcast")(store
      .filter(graft.ops.Bloom.mightContain(bc, col("fingerprint"))).count())
    t("probe self 9m broadcast (warm)")(store
      .filter(graft.ops.Bloom.mightContain(bc, col("fingerprint"))).count())
    // xxhash-only control: the scan + hash without the bloom probe
    t("xxhash only")(store.filter(xxhash64(col("fingerprint")) =!= 0L).count())
    args.lift(1).foreach { batchPath =>
      val batch = spark.read.parquet(batchPath)
      t("plain incremental")(
        graft.ops.Dedup.incrementalDedup(batch, store).count())
      t("bloom incremental")(
        graft.ops.Dedup.incrementalDedupBloom(batch, store).count())
      t("bloom incremental (prebuilt)")(
        graft.ops.Dedup.incrementalDedupBloom(batch, store,
          bloom = Some(bloom)).count())
    }
    spark.stop()
  }
}
