package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT quantiles with O(1) task state.
  *
  * Spark's built-in `percentile` is a TypedImperativeAggregate that buffers
  * EVERY value of the group in the aggregation buffer — with few groups
  * (e.g. 3 `l_returnflag` values over a 100 TB `lineitem`) each final-agg
  * task would hold billions of doubles: executor OOM. This helper computes
  * the same interpolated quantile (`quantile_cont` semantics, h = (n-1)q)
  * as pure shuffle machinery instead:
  *
  *   1. one window `row_number` over (group, value) — a distributed
  *      sort-with-spill, constant memory per task;
  *   2. per-group counts joined back (the window output is already
  *      hash-partitioned by group, so the join and the final groupBy reuse
  *      that exchange);
  *   3. the two bracketing ranks floor(h)/ceil(h) picked by conditional
  *      aggregation and linearly interpolated.
  *
  * Every stage is a HashAggregate / sort / shuffle with bounded state, so
  * the plan survives any group size. Interpolation arithmetic is the same
  * `v_lo + frac * (v_hi - v_lo)` both Spark's `percentile` and DuckDB's
  * `quantile_cont` use, so oracle parity is preserved.
  */
object Quantiles {

  /** Exact interpolated quantiles of `valueCol` per `groupCol`, one output
    * column per `(name, q)`. Nulls are excluded (as in `percentile` /
    * `quantile_cont`); a group with zero non-null values disappears. */
  def groupQuantilesCont(df: DataFrame, groupCol: String, valueCol: String,
      qs: Seq[(String, Double)]): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (_, q) => q >= 0.0 && q <= 1.0 })
    val vals = df.select(col(groupCol), col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
    val w = Window.partitionBy(groupCol).orderBy("__v")
    val ranked = vals.withColumn("__rn", row_number().over(w))
    val counts = vals.groupBy(groupCol).agg(count(lit(1)).as("__n"))
    // h = (n-1)q as double; exactly one row matches each bracketing rank,
    // so min(when(...)) is just "pick it" — tied values make the choice of
    // tie irrelevant (equal __v either way)
    def h(q: Double): Column = (col("__n") - 1).cast("double") * lit(q)
    val aggs = qs.flatMap { case (name, q) =>
      Seq(
        min(when((col("__rn") - 1).cast("double") === floor(h(q)), col("__v")))
          .as(s"__lo_$name"),
        min(when((col("__rn") - 1).cast("double") === ceil(h(q)), col("__v")))
          .as(s"__hi_$name"),
        first(col("__n")).as(s"__n_$name"))
    }
    val picked = ranked.join(counts, Seq(groupCol))
      .groupBy(groupCol)
      .agg(aggs.head, aggs.tail: _*)
    val outs = qs.map { case (name, q) =>
      val n = col(s"__n_$name")
      val hh = (n - 1).cast("double") * lit(q)
      val frac = hh - floor(hh)
      (col(s"__lo_$name") + frac * (col(s"__hi_$name") - col(s"__lo_$name")))
        .as(name)
    }
    picked.select(col(groupCol) +: outs: _*)
  }
}
