package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.QualityFilters

/** Dev tool: per-stage cost breakdown of the hygiene verdict kernel
  * over the synthetic bench corpus.
  * `sbt "runMain graft.ScanProbe [nDocs]"` */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-shuffle")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cp = BenchAccess.corpus(spark, nDocs)
    val df = spark.read.parquet(cp)
    def timed(label: String)(body: => Long): Unit = {
      body // warm
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$r")
    }
    val g = QualityFilters.GopherConfig()
    val r = QualityFilters.RepetitionConfig()
    timed("scan only (count)")(df.count())
    timed("length only")(df.filter(length(col("text")) > 10).count())
    def v(c4: Option[(Int, Int)], go: Option[QualityFilters.GopherConfig],
        rep: Option[QualityFilters.RepetitionConfig], q: Double, l: Seq[String]) =
      df.filter(QualityFilters.hygieneVerdict(col("text"), c4, go, rep, q, l) === 0).count()
    timed("c4 only")(v(Some((3, 5)), None, None, 0.0, Nil))
    timed("c4+gopher")(v(Some((3, 5)), Some(g), None, 0.0, Nil))
    timed("c4+gopher+rep(lines only)")(v(Some((3, 5)), Some(g),
      Some(r.copy(maxTopNgramFrac = Map.empty, maxDupNgramFrac = Map.empty)), 0.0, Nil))
    timed("c4+gopher+rep(full)")(v(Some((3, 5)), Some(g), Some(r), 0.0, Nil))
    timed("c4+gopher+rep+quality")(v(Some((3, 5)), Some(g), Some(r), 0.3, Nil))
    timed("all (=bench row)")(v(Some((3, 5)), Some(g), Some(r), 0.3, Seq("en")))
    spark.stop()
  }
}

/** Exposes Bench's private corpus generator to the probe. */
object BenchAccess {
  def corpus(spark: SparkSession, nDocs: Long): String =
    Bench.corpusForProbe(spark, nDocs)
}
