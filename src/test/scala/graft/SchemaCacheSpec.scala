package graft

import org.apache.spark.sql.functions._

import graft.sources.SchemaCache

class SchemaCacheSpec extends SparkFunSuite {
  import spark.implicits._

  test("repeat open reuses schema; file change re-infers") {
    val dir = java.nio.file.Files.createTempDirectory("graft_schemacache").toString
    val p = s"$dir/t.parquet"
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").write.parquet(p)

    val first = SchemaCache.parquet(spark, p)
    assert(first.schema.fieldNames.toSeq == Seq("id", "s"))
    val again = SchemaCache.parquet(spark, p)
    assert(again.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))

    // overwrite with a DIFFERENT schema: the stat fingerprint changes,
    // so the cache must re-infer rather than serve the stale schema
    Seq((3L, 1.5, "x")).toDF("id", "v", "s").write.mode("overwrite").parquet(p)
    val changed = SchemaCache.parquet(spark, p)
    assert(changed.schema.fieldNames.toSeq == Seq("id", "v", "s"))
    assert(changed.count() == 1)
  }

  test("put-after-write makes the next open job-free and correct") {
    val dir = java.nio.file.Files.createTempDirectory("graft_schemacache2").toString
    val p = s"$dir/w.parquet"
    val df = Seq((1L, "a", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("id", "s", "ts")
    df.write.parquet(p)
    SchemaCache.put(p, df.schema)
    val back = SchemaCache.parquet(spark, p)
    assert(back.schema.fields.forall(_.nullable))
    assert(back.select("id", "s").head() == org.apache.spark.sql.Row(1L, "a"))
  }
}
