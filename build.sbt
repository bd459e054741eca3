ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "timefencespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked run output must reach stdout RAW: sbt's default LoggedOutput
// prefixes every line with [info]/[error], which breaks machine
// consumers of Bench/Verify JSON lines (BENCH parsed:null in rounds
// 1-2 came from exactly this).
run / outputStrategy := Some(StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
scalacOptions += "-deprecation"
// Heap: local[32] runs the whole "cluster" in one JVM — 32 executor
// threads' worth of shuffle + cache share a single heap, and the 8g
// default left the bench GC-thrashing once the cache-heavy operator
// queries had fragmented it (round-3 recorded 90s for a build that
// measures 7s in a fresh JVM). The box has 128 GiB; give the forked
// JVM a production-executor-sized slice.
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // Whole-stage codegen emits a fresh class per query; the JVM default
  // 240MB code cache fills after a few dozen queries, JIT compilation
  // stops/churns, and identical stages then burn 10-25x the CPU
  // interpreted (measured: same 10M-row build stage 48 CPU-s vs
  // 1275 CPU-s within one session). Size it so a long benchmark /
  // notebook session never hits the cliff.
  "-XX:ReservedCodeCacheSize=1g",
)
