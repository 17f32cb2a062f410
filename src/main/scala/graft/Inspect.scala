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

  /** Buffer-granularity refinement of [[necessaryColumns]] — the
    * reference's offsets-vs-data buffer reporting
    * (`lib/utils.py:107-126` buffer promotion,
    * `lib/inspect.py:21-219` report_necessary_buffers): an array column
    * consumed ONLY through `size(...)` needs just its offsets buffer, not
    * its element data. Spark's parquet reader still materializes the full
    * column either way (vectorized readers don't split list offsets from
    * values), so this is *reporting* parity: per scan column,
    * `"offsets"` when every reference to it in the optimized plan sits
    * directly under `size`/`cardinality`, else `"data"`. Useful exactly
    * like the reference's dry run — spotting queries that could run
    * against a lengths-only projection of the data. */
  def necessaryBuffers(df: DataFrame): Map[String, Map[String, String]] = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, ExprId, Size}
    import org.apache.spark.sql.catalyst.plans.logical.Project
    val lp = df.queryExecution.optimizedPlan
    // occurrences of the attribute in e, matched by exprId (name-only
    // matching conflated identically-named columns from different
    // relations — e.g. both sides of a self-join — r6 review finding):
    // true = directly under Size (offsets-only)
    def refs(e: Expression, id: ExprId): Seq[Boolean] = e match {
      case s: Size => s.child match {
        case a: AttributeReference if a.exprId == id => Seq(true)
        case c => refs(c, id)
      }
      case a: AttributeReference if a.exprId == id => Seq(false)
      case _ => e.children.flatMap(refs(_, id))
    }
    // a bare attribute in a projection list is pass-through plumbing
    // (pruning Projects re-emit the column for a consumer above), not a
    // data touch; a bare attribute in the PLAN OUTPUT is a real
    // materialization and counts as data
    def nodeRefs(id: ExprId): Seq[Boolean] = lp.collect {
      case p: Project => p.projectList.flatMap {
        case a: Alias => refs(a.child, id)
        case _: AttributeReference => Nil
        case e => refs(e, id)
      }
      // leaf nodes (relations) list their own output attributes as
      // expressions — declarations, not touches
      case _: org.apache.spark.sql.catalyst.plans.logical.LeafNode => Nil
      case n => n.expressions.flatMap(refs(_, id))
    }.flatten ++ lp.output.filter(_.exprId == id).map(_ => false)
    scans(df).map { s =>
      s.relation.location.rootPaths.mkString(",") ->
        s.output.collect { case a: AttributeReference =>
          val occ = nodeRefs(a.exprId)
          val isArray =
            a.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]
          a.name -> (if (isArray && occ.nonEmpty && occ.forall(identity))
            "offsets" else "data")
        }.toMap
    }.toMap
  }

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
