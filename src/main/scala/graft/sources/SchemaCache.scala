package graft.sources

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Process-level parquet schema cache, keyed on a cheap stat
  * fingerprint (every file's relative path, size and mtime — no
  * content reads).
  *
  * Why: `spark.read.parquet(path)` runs schema inference as a
  * distributed footer-reading job — one extra Spark job (~0.1s of
  * pure scheduling at local[32]) per open, every time, even for a
  * table opened moments ago. A metastore would amortize this; for
  * path-addressed tables this cache is that metastore: the first open
  * pays inference, repeat opens of an UNCHANGED path reuse the schema
  * via `spark.read.schema(...)`, which skips the job entirely. Any
  * file change (size/mtime/set of files) changes the fingerprint and
  * re-infers.
  *
  * The reference engine gets this for free — DuckDB reads footers
  * driver-side per query with no scheduling cost — so matching its
  * small-build latency requires not paying per-open job overhead.
  */
object SchemaCache {

  // one entry PER PATH (value carries the fingerprint it was recorded
  // under): a long-running driver rewriting the same output path every
  // build must not accumulate one stale entry per write
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, StructType)]()

  /** Stat fingerprint of a file or directory: hash of every regular
    * file's (relative path, size, mtime_ns). Directory walk only —
    * no file contents are read. Returns None when the path does not
    * exist (caller falls through to plain inference and its error). */
  private def fingerprint(path: String): Option[Long] =
    try {
      val root = Paths.get(path)
      if (!Files.exists(root)) None
      else {
        var h = 1125899906842597L // large prime seed
        def mix(v: Long): Unit = { h = h * 31 + v }
        def mixStr(s: String): Unit = mix(s.hashCode.toLong)
        def walk(p: Path): Unit = {
          if (Files.isDirectory(p)) {
            // sorted for a deterministic fingerprint across walks; the
            // stream MUST be closed or every fingerprint leaks a
            // directory fd until GC
            val listing = Files.list(p)
            val children =
              try listing.iterator().asScala.toArray.sortBy(_.toString)
              finally listing.close()
            children.foreach(walk)
          } else {
            mixStr(root.relativize(p).toString)
            mix(Files.size(p))
            mix(Files.getLastModifiedTime(p).to(java.util.concurrent.TimeUnit.NANOSECONDS))
          }
        }
        walk(root)
        Some(h)
      }
    } catch { case _: Exception => None }

  /** Open a parquet path, reusing the cached schema when the path's
    * stat fingerprint is unchanged since the last open. */
  def parquet(spark: SparkSession, path: String): DataFrame =
    fingerprint(path) match {
      case Some(fp) =>
        cache.get(path) match {
          case (`fp`, known) => spark.read.schema(known).parquet(path)
          case _ =>
            val df = spark.read.parquet(path)
            cache.put(path, (fp, df.schema))
            df
        }
      case None => spark.read.parquet(path)
    }

  /** Open a header CSV with inferred schema, reusing the cached
    * schema when the file is unchanged. Worth far more than the
    * parquet variant: CSV inference SCANS THE WHOLE FILE (no footer),
    * so a repeat open of an N-GB csv pays a full extra read. The
    * delimiter participates in the key — the same file parsed with a
    * different delimiter yields a different schema. */
  def csv(spark: SparkSession, path: String, delimiter: String,
      timestampFormat: Option[String] = None): DataFrame = {
    def open(schema: Option[StructType]): DataFrame = {
      var r = spark.read.option("header", "true").option("delimiter", delimiter)
      // explicit timestampFormat participates in BOTH inference and
      // parsing — an unparseable string under the given format fails
      // loudly instead of silently degrading the column to string
      timestampFormat.foreach(fmt => r = r.option("timestampFormat", fmt))
      schema match {
        case Some(s) => r.schema(s).csv(path)
        case None    => r.option("inferSchema", "true").csv(path)
      }
    }
    fingerprint(path) match {
      case Some(fp) =>
        // the format participates in the key: the same file parsed
        // under a different format yields a different schema
        val key = s"csv:$delimiter:${timestampFormat.getOrElse("")}:$path"
        cache.get(key) match {
          case (`fp`, known) => open(Some(known))
          case _ =>
            val df = open(None)
            cache.put(key, (fp, df.schema))
            df
        }
      case None => open(None)
    }
  }

  /** Record a schema we already hold (e.g. just wrote the files) so
    * the next open of `path` skips inference without ever running it. */
  def put(path: String, schema: StructType): Unit = {
    // parquet read-back reports every field nullable AT EVERY NESTING
    // LEVEL; match that recursively so a cached-schema open is
    // indistinguishable from an inferred one even for struct/array/map
    // columns (a top-level-only pass would leave nested fields
    // non-nullable and make put-seeded and inferred entries diverge)
    fingerprint(path).foreach(fp =>
      cache.put(path, (fp, asNullable(schema).asInstanceOf[StructType])))
  }

  private def asNullable(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = dt match {
    case s: StructType =>
      StructType(s.fields.map(f =>
        f.copy(dataType = asNullable(f.dataType), nullable = true)))
    case a: org.apache.spark.sql.types.ArrayType =>
      a.copy(elementType = asNullable(a.elementType), containsNull = true)
    case m: org.apache.spark.sql.types.MapType =>
      m.copy(keyType = asNullable(m.keyType),
        valueType = asNullable(m.valueType), valueContainsNull = true)
    case other => other
  }

  /** Test hook. */
  private[graft] def invalidateAll(): Unit = cache.clear()
}
