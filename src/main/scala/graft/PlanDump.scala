package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of a driver-contract
  * query without executing it to completion.
  * `sbt "runMain graft.PlanDump q_pit_union [sfDir]"`
  * Several names can be comma-separated; each plan is preceded by an
  * `=== <name> ===` marker line so a script can split the output.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("q_build_e2e")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          println(s"=== $name ===")
          fn(spark, sfDir).explain("formatted")
        case None =>
          System.err.println(
            s"unknown query '$name'; have: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
      }
    }
    spark.stop()
  }
}
