package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run every driver-contract query (warmup + reps, no
  * clearCache between reps — exactly a Bench measure) and attribute
  * `CacheManager: Asked to cache already cached data` warnings to the
  * query that fired them. Keeps the bench tail warning-free: a hit
  * here means some operator re-issues cache() against a plan that is
  * already resident (wasted analysis work and log noise at scale).
  * `sbt "runMain graft.WarnScan [sfDir] [reps] [namePrefix]"`
  */
object WarnScan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val prefix = args.lift(2).getOrElse("")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // count CacheManager warnings via a log4j2 appender (attach AFTER
    // session creation — Spark reconfigures log4j on startup)
    val count = new java.util.concurrent.atomic.AtomicInteger
    val probe = new org.apache.logging.log4j.core.appender.AbstractAppender(
      "warnscan", null, null, false, Array.empty) {
      override def append(e: org.apache.logging.log4j.core.LogEvent): Unit =
        if (e.getMessage.getFormattedMessage.contains("already cached")) {
          count.incrementAndGet(); ()
        }
    }
    probe.start()
    org.apache.logging.log4j.LogManager
      .getLogger("org.apache.spark.sql.execution.CacheManager")
      .asInstanceOf[org.apache.logging.log4j.core.Logger].addAppender(probe)

    var dirty = 0
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(_._1.startsWith(prefix)).foreach { case (name, fn) =>
        val before = count.get()
        try {
          (0 to reps).foreach(_ => fn(spark, sfDir).count()) // 0th = warmup
          val fired = count.get() - before
          if (fired > 0) { dirty += 1; println(s"[warnscan] $name: $fired re-cache warnings") }
          else println(s"[warnscan] $name: clean")
        } catch {
          case e: Exception => println(s"[warnscan] $name: FAILED ${e.getMessage}")
        } finally {
          spark.catalog.clearCache()
        }
      }
    println(s"[warnscan] dirty queries: $dirty")
    spark.stop()
  }
}
