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

  test("csv: cached schema reused; delimiter is part of the key; change re-infers") {
    val dir = java.nio.file.Files.createTempDirectory("graft_schemacache_csv").toString
    val p = s"$dir/t.csv"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(p), "id,v\n1,2.5\n2,3.5\n")
    val first = SchemaCache.csv(spark, p, ",")
    assert(first.schema("id").dataType.typeName == "integer")
    assert(SchemaCache.csv(spark, p, ",").count() == 2)
    // same file, different delimiter -> different parse, not the cached one
    val pipe = SchemaCache.csv(spark, p, "|")
    assert(pipe.schema.fields.length == 1)
    // file change -> re-infer
    Thread.sleep(5) // ensure mtime tick even on coarse filesystems
    java.nio.file.Files.writeString(java.nio.file.Paths.get(p), "id,v,w\n1,2.5,x\n")
    val changed = SchemaCache.csv(spark, p, ",")
    assert(changed.schema.fieldNames.toSeq == Seq("id", "v", "w"))
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

  test("put nullability is recursive: nested structs/arrays match inference") {
    val dir = java.nio.file.Files.createTempDirectory("graft_schemacache3").toString
    val p = s"$dir/nested.parquet"
    val df = Seq((1L, (2L, "x"), Seq(1.0, 2.0)))
      .toDF("id", "pair", "xs")
    df.write.parquet(p)
    // the written frame's schema has non-nullable nested fields; a
    // put-seeded entry must still match what inference would report
    SchemaCache.put(p, df.schema)
    val seeded = SchemaCache.parquet(spark, p).schema
    SchemaCache.invalidateAll()
    val inferred = SchemaCache.parquet(spark, p).schema
    assert(seeded == inferred,
      s"put-seeded $seeded diverges from inferred $inferred")
    def allNullable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case s: org.apache.spark.sql.types.StructType =>
        s.fields.forall(f => f.nullable && allNullable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType =>
        a.containsNull && allNullable(a.elementType)
      case _ => true
    }
    assert(allNullable(seeded))
  }
}
