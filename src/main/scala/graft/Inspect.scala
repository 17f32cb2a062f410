package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Plan-inspection helpers — the engine's answer to the reference's
  * typetracer dry-run APIs (`report_necessary_columns` /
  * `report_necessary_buffers`, /root/reference/src/dask_awkward/lib/inspect.py:21-219).
  * The reference executes the graph metadata-only to learn which buffers an
  * expression touches; Catalyst computes the same thing symbolically, so
  * here we just read it off the optimized physical plan.
  */
object Inspect {

  private def scans(df: DataFrame): Seq[FileSourceScanExec] = {
    val plan = df.queryExecution.executedPlan
    val unwrapped = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    unwrapped.collect { case s: FileSourceScanExec => s }
  }

  /** Columns each file scan will actually read (the reference's
    * "necessary columns"): scan output attribute names. */
  def necessaryColumns(df: DataFrame): Map[String, Seq[String]] =
    scans(df).map(s =>
      s.relation.location.rootPaths.mkString(",") ->
        s.requiredSchema.fieldNames.toSeq).toMap

  /** Data filters pushed into each scan (predicate pushdown — absent in the
    * reference, SURVEY §4.1; here it's load-bearing at scale). */
  def pushedFilters(df: DataFrame): Seq[String] =
    scans(df).flatMap(_.dataFilters.map(_.sql))

  /** The formatted physical plan (reference `visualize` analogue). */
  def explainString(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  /** True if the plan broadcasts at least one side of a join. */
  def hasBroadcast(df: DataFrame): Boolean =
    explainString(df).contains("BroadcastHashJoin")
}
