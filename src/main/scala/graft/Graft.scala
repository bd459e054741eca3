package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.engine._
import graft.model._

/** Public API facade — the Scala analog of the reference's module
  * exports (`/root/reference/src/timefence/__init__.py:40-55`):
  * `build`, `audit` (+ `audit.temporal`), `explain`, `diff`, plus the
  * model types re-exported from [[graft.model]].
  *
  * {{{
  * import graft.Graft
  * import graft.model._
  *
  * val users = Source.parquet("users", "/data/users.parquet",
  *   keys = Seq("user_id"), timestamp = "updated_at")
  * val country = Feature.columns(users, Seq("country"))
  * val labels = Labels.parquet("/data/labels.parquet",
  *   keys = Seq("user_id"), labelTime = "label_time", target = Seq("churned"))
  *
  * val result = Graft.build(spark, labels, Seq(country),
  *   BuildOptions(output = Some("/data/train.parquet")))
  * result.validate()
  * }}}
  */
object Graft {

  /** Library version, recorded in build manifests (the reference stamps
    * `timefence_version` the same way, engine.py:1425). */
  val Version = "0.6.0"

  /** Point-in-time-correct training-set build (SURVEY §3.1).
    *
    * `progress` is the reference's `build(progress=...)` stage hook
    * (engine.py:945-958): invoked with (stage, featureName) at `load`,
    * `compute`/`join` per feature, `write` and `verify` — see
    * [[graft.engine.BuildOptions.progress]] for the timing semantics.
    * Passing it here overrides any hook already set in `options`. */
  def build(
      spark: SparkSession,
      labels: Labels,
      features: Seq[Feature],
      options: BuildOptions = BuildOptions(),
      progress: (String, String) => Unit = BuildOptions.NoProgress
  ): BuildResult = Build(spark, labels, features,
    if (progress eq BuildOptions.NoProgress) options
    else options.copy(progress = progress))

  /** Temporal-leakage audit of an existing dataset (mode A). */
  def auditTemporal(
      data: DataFrame,
      labelTime: String,
      featureTimeColumns: Map[String, String]
  ): Audit.AuditReport = Audit.temporal(data, labelTime, featureTimeColumns)

  /** Rebuild-and-compare audit (mode B). */
  def auditRebuild(
      spark: SparkSession,
      data: DataFrame,
      features: Seq[Feature],
      keys: Seq[String],
      labelTime: String
  ): Audit.AuditReport = Audit.rebuild(spark, data, features, keys, labelTime)

  /** Dry-run plan: no joins executed. */
  def explain(
      spark: SparkSession,
      labels: Labels,
      features: Seq[Feature],
      options: BuildOptions = BuildOptions()
  ): Explain.ExplainResult = Explain(spark, labels, features, options)

  /** Parity stub with the reference's `from_dbt` (`__init__.py:17-37`
    * — a placeholder that always raises there too). */
  def fromDbt(manifestPath: String): Nothing =
    throw new UnsupportedOperationException(
      "from_dbt is not implemented (the reference ships the same always-raising stub). " +
        "Define Sources against the dbt-produced tables directly.")

  /** Dataset diff under numeric tolerance. */
  def diff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keys: Seq[String],
      labelTime: String,
      atol: Double = Audit.DefaultAtol,
      rtol: Double = Audit.DefaultRtol
  ): Diff.DiffResult = Diff(oldDf, newDf, keys, labelTime, atol, rtol)
}
