package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.model._
import graft.operators.AsOfJoin
import graft.util.Durations

/** Dry-run plan rendering: executes NO joins (the reference only counts
  * labels and renders the per-feature window plan,
  * `/root/reference/src/timefence/engine.py:1880-1964`).
  */
object Explain {

  final case class FeaturePlan(
      feature: String,
      source: String,
      mode: String,
      strategy: String,
      window: String,
      embargo: String,
      staleness: Option[String]
  )

  final case class ExplainResult(
      labelRows: Long,
      labelColumns: Seq[String],
      plans: Seq[FeaturePlan]
  ) {
    def render: String = {
      val sb = new StringBuilder
      sb.append(s"Labels: $labelRows rows (${labelColumns.mkString(", ")})\n")
      plans.foreach { p =>
        sb.append(s"Feature ${p.feature} <- ${p.source} [${p.mode}] strategy=${p.strategy}\n")
        sb.append(s"  window: ${p.window}  embargo: ${p.embargo}")
        p.staleness.foreach(s => sb.append(s"  staleness: $s"))
        sb.append('\n')
      }
      sb.toString
    }
  }

  def apply(
      spark: SparkSession,
      labels: Labels,
      features: Seq[Feature],
      options: BuildOptions = BuildOptions()
  ): ExplainResult = {
    val lblDf = labels.resolve(spark)
    val labelRows = lblDf.count()
    val op = if (options.join == "inclusive") "]" else ")"
    val plans = features.map { f =>
      val modeStr = f.mode match {
        case _: ColumnsMode   => "columns"
        case _: SqlMode       => "sql"
        case _: TransformMode => "transform"
      }
      val strat = options.strategy match {
        case AsOfJoin.Strategy.RowNumber => "row_number"
        case AsOfJoin.Strategy.UnionAsOfSegmented(b) =>
          s"union_asof_segmented(${Durations.format(b)})"
        case _ => "union_asof"
      }
      FeaturePlan(
        f.name,
        f.source.name,
        modeStr,
        strat,
        s"[label_time - ${Durations.format(options.maxLookback)}, label_time - ${Durations.format(f.embargo)}$op",
        Durations.format(f.embargo),
        f.maxStaleness.map(Durations.format)
      )
    }
    ExplainResult(labelRows, lblDf.columns.toSeq, plans)
  }
}
