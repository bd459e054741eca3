package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String

/** Dev tool: single-threaded per-function cost breakdown of the
  * hygiene-verdict kernel over a sample of the bench corpus —
  * locates where the gopher_c4_10m scan's CPU goes.
  * `sbt "runMain graft.KernelProbe [nSample]"` */
object KernelProbe {
  def main(args: Array[String]): Unit = {
    val nSample = args.headOption.map(_.toInt).getOrElse(200000)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-shuffle")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cp = BenchAccess.corpus(spark, 1000000L)
    val texts: Array[UTF8String] = spark.read.parquet(cp)
      .select("text").limit(nSample).collect()
      .map(r => UTF8String.fromString(r.getString(0)))
    spark.stop()

    import graft.functions._
    import graft.ops.QualityFilters
    val g = QualityFilters.GopherConfig()
    val r = QualityFilters.RepetitionConfig()
    // build the spec exactly like hygieneVerdict does
    val spec = QualityFilters.hygieneSpec(Some((3, 5)), Some(g), Some(r),
      0.3, Seq("en"))

    val Ws = java.util.regex.Pattern.compile("\\s+")
    def time(label: String, reps: Int = 3)(body: => Long): Unit = {
      body // warm
      var best = Long.MaxValue
      var sink = 0L
      (1 to reps).foreach { _ =>
        val t0 = System.nanoTime()
        sink ^= body
        best = math.min(best, System.nanoTime() - t0)
      }
      println(f"[kp] $label%-34s ${best / 1e9}%8.3fs  (sink=${sink % 97})")
    }

    time("verdict full") {
      var s = 0L; var i = 0
      while (i < texts.length) { s += Hygiene.verdict(texts(i), spec); i += 1 }; s
    }
    time("c4LineFilter only") {
      var s = 0L; var i = 0
      while (i < texts.length) {
        s += TextStats.c4LineFilter(texts(i), 5).getInt(1); i += 1 }; s
    }
    time("toString") {
      var s = 0L; var i = 0
      while (i < texts.length) { s += texts(i).toString.length; i += 1 }; s
    }
    time("toLowerCase") {
      var s = 0L; var i = 0
      while (i < texts.length) { s += texts(i).toLowerCase.numBytes(); i += 1 }; s
    }
    time("regex split \\s+") {
      var s = 0L; var i = 0
      while (i < texts.length) {
        s += Ws.split(texts(i).trim().toString, -1).length; i += 1 }; s
    }
    time("regex split x2 (raw+lower)") {
      var s = 0L; var i = 0
      while (i < texts.length) {
        s += Ws.split(texts(i).trim().toString, -1).length
        s += Ws.split(texts(i).toLowerCase.trim().toString, -1).length
        i += 1 }; s
    }
    time("dupLineRatio") {
      var s = 0L; var i = 0
      while (i < texts.length) {
        s += (NgramRepetition.dupLineRatioCompute(texts(i)) * 100).toLong; i += 1 }; s
    }
    val topNs = Array(2, 3, 4)
    val dupNs = Array(5, 6, 7, 8, 9, 10)
    time("ngramRep compute (9 families)") {
      var s = 0L; var i = 0
      while (i < texts.length) {
        s += (NgramRepetition.compute(texts(i), topNs, dupNs)
          .getDouble(0) * 100).toLong; i += 1 }; s
    }
    time("lineStats") {
      var s = 0L; var i = 0
      while (i < texts.length) {
        s += TextStats.lineStats(texts(i)).getInt(0); i += 1 }; s
    }
  }
}
