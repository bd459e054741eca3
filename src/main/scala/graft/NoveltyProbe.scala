package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-cost breakdown of the KMV novelty pipeline at the
  * bench shape (both snapshot sides of the 10M corpus).
  * `sbt "runMain graft.NoveltyProbe [nDocs]"` */
object NoveltyProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(10000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-shuffle")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cp = BenchAccess.corpus(spark, nDocs)
    val docs = spark.read.parquet(cp)
    val old = docs.filter(col("doc_id") < nDocs * 9 / 10)
    val nw = docs.filter(col("doc_id") >= nDocs / 10)
    import graft.functions.{KmvSketch, Shingles}
    def timed(label: String)(body: => Unit): Unit = {
      body // warm
      val t0 = System.nanoTime()
      body
      println(f"[np] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    timed("scan only (both sides)") { noop(old.select("text")); noop(nw.select("text")) }
    timed("shingles size (one side)") {
      noop(old.select(size(Shingles.shingles(col("text"), 3)).as("n")))
    }
    timed("shingles explode (one side)") {
      noop(old.select(explode(Shingles.shingles(col("text"), 3)).as("g"))
        .select(length(col("g")).as("l")))
    }
    timed("explode+xxhash52 (one side)") {
      noop(old.select(explode(Shingles.shingles(col("text"), 3)).as("g"))
        .select(KmvSketch.hash52Fast(col("g")).as("h")))
    }
    timed("explode+hash+sketch agg (one side)") {
      old.select(explode(Shingles.shingles(col("text"), 3)).as("g"))
        .select(KmvSketch.hash52Fast(col("g")).as("h"))
        .agg(KmvSketch.sketch(col("h"), 4096)).collect()
    }
    timed("full ngramNoveltyApprox") {
      graft.ops.TextAnalysis.ngramNoveltyApprox(old, nw, n = 3, k = 4096,
        hasher = graft.functions.KmvSketch.hash52Fast).collect()
    }
    spark.stop()
  }
}
