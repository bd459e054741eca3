package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: scan EVERY driver-contract query's physical plan for a
  * given operator substring (default SortAggregate — the
  * silently-slow aggregation Spark falls back to when an aggregate
  * buffer isn't hash-supported) and print which queries contain it.
  * `sbt "runMain graft.PlanSweep [pattern] [sfDir]"`
  */
object PlanSweep {
  def main(args: Array[String]): Unit = {
    val pattern = args.headOption.getOrElse("SortAggregate")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var hits = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val n = pattern.r.findAllIn(plan).size
        if (n > 0) { hits += 1; println(s"[plansweep] $name: $n x $pattern") }
      } catch {
        case e: Throwable => println(s"[plansweep] $name: ERROR ${e.getMessage}")
      }
    }
    println(s"[plansweep] $hits queries contain '$pattern'")
    spark.stop()
  }
}
