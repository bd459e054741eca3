package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-cost breakdown of the shuffle_10m row
  * (globalOrderIndex + write). `sbt "runMain graft.ShuffleProbe [nDocs]"` */
object ShuffleProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(10000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-shuffle")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cp = BenchAccess.corpus(spark, nDocs)
    def docs = spark.read.parquet(cp).select("doc_id", "text")
    def timed(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[sp] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      spark.catalog.clearCache()
      try spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      catch { case _: Exception => () }
      System.gc()
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // warm the session once
    noop(docs)
    timed("read+noop") { noop(docs) }
    timed("read+key+range+sort+noop") {
      noop(docs.withColumn("k", graft.ops.Sampling.shuffleKeyOf(col("doc_id"), 42))
        .repartitionByRange(col("k"), col("doc_id"))
        .sortWithinPartitions(col("k").asc, col("doc_id").asc))
    }
    timed("globalOrderIndex+noop") {
      noop(graft.ops.Sampling.globalOrderIndex(docs, "doc_id"))
    }
    timed("globalOrderIndex+parquet (=bench row)") {
      graft.ops.Sampling.globalOrderIndex(docs, "doc_id")
        .write.mode("overwrite").parquet("/dev/shm/graft-shuffleprobe-out")
      Bench.deleteRec(java.nio.file.Paths.get("/dev/shm/graft-shuffleprobe-out"))
    }
    spark.stop()
  }
}
