package graft.model

import java.time.Duration

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.errors._
import graft.util.{Durations, Names}

/** Data model for the point-in-time engine. Semantics mirror the
  * reference's user-facing classes (`/root/reference/src/timefence/core.py`)
  * re-expressed as Scala case classes over Spark DataFrames:
  *   - Source      (core.py:20-93)   a timestamped history table
  *   - SqlSource   (core.py:110-149) a source defined by a SQL query
  *   - Feature     (core.py:155-297) derived feature, 3 exclusive modes
  *   - Labels      (core.py:300-351) the label spine
  *   - FeatureSet  (core.py:354-379) flat named list of features
  */
sealed trait SourceLike {
  def name: String
  def keys: Seq[String]
  def timestamp: String

  /** Resolve to a DataFrame. Path-based sources read lazily. */
  def resolve(spark: SparkSession): DataFrame
}

object SourceFormat extends Enumeration {
  val Parquet, Csv = Value

  def detect(path: String): Value = {
    val lower = path.toLowerCase
    if (lower.endsWith(".parquet") || lower.endsWith(".pq")) Parquet
    else if (lower.endsWith(".csv")) Csv
    else
      throw Errors.config(
        s"Cannot detect format of '$path'.",
        "Use a .parquet/.pq/.csv path or pass format explicitly."
      )
  }
}

/** A timestamped history table backed by a path or an in-memory frame.
  * Exactly one of `path` / `df` must be given (core.py:54-61); `keys`
  * must be non-empty (core.py:65-69).
  */
final case class Source(
    name: String,
    keys: Seq[String],
    timestamp: String,
    path: Option[String] = None,
    df: Option[DataFrame] = None,
    format: Option[SourceFormat.Value] = None,
    delimiter: String = ",",
    timestampFormat: Option[String] = None
) extends SourceLike {
  if (name.isEmpty)
    throw Errors.config("Source name must be non-empty.", "Give the source a name.")
  if (keys.isEmpty)
    throw Errors.config(
      s"Source '$name' has no keys.",
      "Provide at least one entity key column."
    )
  if (path.isEmpty == df.isEmpty)
    throw Errors.config(
      s"Source '$name' must set exactly one of path or df.",
      "Pass either a file path or an in-memory DataFrame, not both/neither."
    )
  // The reference declares timestamp_format on every Source but its
  // engine never reads it (core.py:39,51,73 — a dead parameter; see
  // COVERAGE.md). Here it is the REAL control where one exists — the
  // CSV reader's timestampFormat option — and loudly rejected where
  // none does (parquet/df carry typed timestamps; accepting a format
  // that has no effect is worse than rejecting it).
  if (timestampFormat.isDefined &&
      (df.isDefined || resolvedFormat != SourceFormat.Csv))
    throw Errors.config(
      s"Source '$name' sets timestampFormat on a non-CSV source.",
      "timestampFormat only affects CSV parsing; parquet and DataFrame " +
        "sources carry typed timestamps already."
    )

  def resolvedFormat: SourceFormat.Value =
    format.getOrElse(SourceFormat.detect(path.get))

  override def resolve(spark: SparkSession): DataFrame = df.getOrElse {
    resolvedFormat match {
      // SchemaCache skips the per-open schema-inference job for
      // unchanged paths (stat-fingerprint keyed)
      case SourceFormat.Parquet => graft.sources.SchemaCache.parquet(spark, path.get)
      case SourceFormat.Csv =>
        // cached-schema open: CSV inference scans the whole file, so a
        // repeat open of an unchanged csv would pay a full extra read
        graft.sources.SchemaCache.csv(spark, path.get, delimiter, timestampFormat)
    }
  }
}

object Source {
  def parquet(name: String, path: String, keys: Seq[String], timestamp: String): Source =
    Source(name, keys, timestamp, path = Some(path), format = Some(SourceFormat.Parquet))
  def csv(name: String, path: String, keys: Seq[String], timestamp: String,
      delimiter: String = ",", timestampFormat: Option[String] = None): Source =
    Source(name, keys, timestamp, path = Some(path), format = Some(SourceFormat.Csv),
      delimiter = delimiter, timestampFormat = timestampFormat)
  def frame(name: String, df: DataFrame, keys: Seq[String], timestamp: String): Source =
    Source(name, keys, timestamp, df = Some(df))
}

/** A source produced by running a SQL query against the session
  * catalog (reference runs it verbatim on DuckDB, engine.py:476-477).
  */
final case class SqlSource(
    name: String,
    query: String,
    keys: Seq[String],
    timestamp: String
) extends SourceLike {
  if (name.isEmpty)
    throw Errors.config("SQLSource name must be non-empty.", "Give the source a name.")
  if (keys.isEmpty)
    throw Errors.config(
      s"SQLSource '$name' has no keys.",
      "Provide at least one entity key column."
    )
  override def resolve(spark: SparkSession): DataFrame = spark.sql(query)
}

/** The three exclusive feature computation modes (core.py:197-202). */
sealed trait FeatureMode
/** Select/rename map: out-name -> source column (core.py:205-217). */
final case class ColumnsMode(columns: Map[String, String]) extends FeatureMode
/** SQL with a `{source}` placeholder; must output keys + feature_time
  * (core.py:221-229). */
final case class SqlMode(sql: String) extends FeatureMode
/** Arbitrary DataFrame transform; must output keys + feature_time.
  * `version` participates in cache keys (the JVM has no reliable
  * source introspection, unlike the reference's inspect.getsource —
  * SURVEY §7.3). */
final case class TransformMode(fn: DataFrame => DataFrame, version: String = "0")
    extends FeatureMode

object OnDuplicate extends Enumeration {
  val Error, KeepAny = Value
  def parse(s: String): Value = s match {
    case "error"    => Error
    case "keep_any" => KeepAny
    case other =>
      throw Errors.config(
        s"Invalid on_duplicate '$other'.",
        "Use 'error' or 'keep_any'."
      )
  }
}

/** A named derived feature over a source, with temporal-availability
  * controls. `embargo` delays availability (upper bound becomes
  * `feature_time < label_time - embargo`); `keyMapping` translates
  * label key names to source key names; `maxStaleness` additionally
  * floors feature age.
  */
final case class Feature(
    name: String,
    source: SourceLike,
    mode: FeatureMode,
    embargo: Duration = Duration.ZERO,
    keyMapping: Map[String, String] = Map.empty,
    onDuplicate: OnDuplicate.Value = OnDuplicate.Error,
    maxStaleness: Option[Duration] = None
) {
  if (name.isEmpty)
    throw Errors.config("Feature name must be non-empty.", "Give the feature a name.")
  mode match {
    case ColumnsMode(cols) if cols.isEmpty =>
      throw Errors.config(
        s"Feature '$name' columns mode needs at least one column.",
        "Provide a non-empty column list."
      )
    case _ => ()
  }
  def safeName: String = Names.safeName(name)
}

object Feature {
  /** Columns-mode with identity renames, name auto-derived by joining
    * the column names (core.py:238-255). */
  def columns(source: SourceLike, cols: Seq[String],
      name: Option[String] = None,
      embargo: String = "0",
      keyMapping: Map[String, String] = Map.empty,
      onDuplicate: String = "error"): Feature =
    Feature(
      name.getOrElse(cols.mkString("_")),
      source,
      ColumnsMode(cols.map(c => c -> c).toMap),
      Durations.parse(embargo),
      keyMapping,
      OnDuplicate.parse(onDuplicate)
    )

  /** SQL-mode; inline SQL requires an explicit name (core.py:238-255). */
  def sql(source: SourceLike, query: String, name: String,
      embargo: String = "0",
      keyMapping: Map[String, String] = Map.empty,
      onDuplicate: String = "error"): Feature =
    Feature(name, source, SqlMode(query), Durations.parse(embargo), keyMapping,
      OnDuplicate.parse(onDuplicate))

  /** Transform-mode with a user-supplied cache version. */
  def transform(source: SourceLike, fn: DataFrame => DataFrame, name: String,
      version: String = "0",
      embargo: String = "0",
      keyMapping: Map[String, String] = Map.empty,
      onDuplicate: String = "error"): Feature =
    Feature(name, source, TransformMode(fn, version), Durations.parse(embargo),
      keyMapping, OnDuplicate.parse(onDuplicate))
}

/** The label spine: entity keys + label_time + target column(s).
  * `target` must be non-empty (core.py:343-346).
  */
final case class Labels(
    keys: Seq[String],
    labelTime: String,
    target: Seq[String],
    path: Option[String] = None,
    df: Option[DataFrame] = None
) {
  if (keys.isEmpty)
    throw Errors.config("Labels have no keys.", "Provide at least one key column.")
  if (target.isEmpty)
    throw Errors.config("Labels have no target.", "Provide at least one target column.")
  if (path.isEmpty == df.isEmpty)
    throw Errors.config(
      "Labels must set exactly one of path or df.",
      "Pass either a file path or an in-memory DataFrame, not both/neither."
    )

  def resolve(spark: SparkSession): DataFrame =
    df.getOrElse(graft.sources.SchemaCache.parquet(spark, path.get))
}

object Labels {
  def parquet(path: String, keys: Seq[String], labelTime: String,
      target: Seq[String]): Labels =
    Labels(keys, labelTime, target, path = Some(path))
  def frame(df: DataFrame, keys: Seq[String], labelTime: String,
      target: Seq[String]): Labels =
    Labels(keys, labelTime, target, df = Some(df))
}

/** Flat named list of features — "No nesting, no inheritance"
  * (core.py:357). */
final case class FeatureSet(name: String, features: Seq[Feature])

object FeatureSet {
  /** Flatten a mixed list of Feature / FeatureSet (core.py:382-392). */
  def flatten(items: Seq[Any]): Seq[Feature] = items.flatMap {
    case f: Feature    => Seq(f)
    case fs: FeatureSet => fs.features
    case other =>
      throw Errors.config(
        s"Unsupported feature item: ${other.getClass.getName}.",
        "Pass Feature or FeatureSet instances."
      )
  }
}
