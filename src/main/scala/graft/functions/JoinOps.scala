package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Join shapes Spark has no native operator for — as-of (time-travel) and
  * range (interval) joins — built as compositions that keep the plan an
  * equi-shuffle rather than the broadcast-nested-loop Spark falls back to
  * for pure inequality conditions. Both are everyday operators in a
  * training-data pipeline (joining each example to the latest feature
  * snapshot; bucketing metrics into threshold tiers).
  */
object JoinOps {

  /** Backward as-of join: each left row picks the right row with the
    * greatest `ts` <= the left row's `ts` within the same `key` (DuckDB
    * `ASOF LEFT JOIN` semantics, l.ts >= r.ts).
    *
    * Shape: union both sides tagged, one window over (key, ts) with an
    * ignore-nulls `last` carrying the latest right row forward, keep left
    * rows. ONE shuffle (hash by key) + per-partition sort — state is one
    * carried row per partition slot, never a nested loop, and skew only
    * concentrates on genuinely hot keys (salt upstream if needed). Right
    * columns (except `key`) come back `suffix`-renamed; unmatched = null.
    */
  def asofBackward(left: DataFrame, right: DataFrame, key: String,
      ts: String, suffix: String = "_r"): DataFrame = {
    val lCols = left.columns.toSeq
    val rCols = right.columns.toSeq.filterNot(_ == key)
    val lStruct = StructType(left.schema.fields)
    val rStruct = StructType(right.schema.fields.filterNot(_.name == key))
    val lTag = left.select(col(key), col(ts).as("__ts"), lit(1).as("__side"),
      struct(lCols.map(col): _*).as("__l"),
      lit(null).cast(rStruct).as("__r"))
    // null-ts right rows are dropped (DuckDB ASOF: null compares false to
    // everything) — otherwise they'd sort nulls-FIRST in the window and be
    // carried forward as a bogus "latest" match for every left row
    val rTag = right.filter(col(ts).isNotNull)
      .select(col(key), col(ts).as("__ts"), lit(0).as("__side"),
        lit(null).cast(lStruct).as("__l"),
        struct(rCols.map(col): _*).as("__r"))
    // at equal ts the right row sorts first (side 0 < 1), so l.ts == r.ts
    // matches — exactly ASOF's >= bound. `__r` as the final sort key makes
    // ties between right rows sharing (key, ts) resolve by row contents,
    // identically on every run (requires orderable right columns — no
    // maps). Note: this fixes run-to-run determinism, not engine
    // agreement — DuckDB's native ASOF picks an ARBITRARY tied row, so an
    // oracle comparison on tie-carrying data needs a tie-free right side.
    val w = Window.partitionBy(key).orderBy(col("__ts"), col("__side"), col("__r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTag.unionByName(rTag)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(lCols.map(c => col("__l").getField(c).as(c)) ++
        rCols.map(c => col("__m").getField(c).as(c + suffix)): _*)
  }

  /** [[asofBackward]] on the NATIVE whole-operator path: the custom
    * `AsofJoinNode` logical plan, planned by `AsofJoinStrategy` into a
    * one-pass streaming-merge `AsofJoinExec` (SURVEY §7.3 path (c); see
    * graft.plans.AsofJoin). Same contract and output shape as the window
    * form — right columns come back `suffix`-renamed, unmatched = null —
    * and the two are asserted equal in JoinOpsSpec. The merge exec does no
    * window buffering: O(|L|+|R|) per partition with one retained snapshot
    * row, which at 100 TB replaces the union-sort's carried-column state
    * with a plain sorted merge (same single hash shuffle per side). */
  def asofBackwardNative(left: DataFrame, right: DataFrame, key: String,
      ts: String, suffix: String = "_r"): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies
        .contains(graft.plans.AsofJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsofJoinStrategy
    }
    // fresh aliases give the right side new exprIds, so a self-join (both
    // sides from one table) can't produce ambiguous attributes; the key is
    // renamed away from the left's column namespace and dropped after
    val rCols = col(ts).as("__asof_ts") +:
      right.columns.filterNot(_ == key).toSeq.map(c => col(c).as(c + suffix))
    val r2 = right.select(col(key).as("__asof_key") +: rCols: _*)
    val lPlan = GraftColumnBridge.analyzed(left)
    val rPlan = GraftColumnBridge.analyzed(r2)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        name: String) = p.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"no column $name"))
    val node = graft.plans.AsofJoinNode(lPlan, rPlan,
      attr(lPlan, key), attr(lPlan, ts),
      attr(rPlan, "__asof_key"), attr(rPlan, "__asof_ts"))
    GraftColumnBridge.ofRows(spark, node)
      .drop("__asof_key", "__asof_ts")
  }

  /** Bucketed interval-overlap join: pair every interval of `a` with every
    * interval of `b` that overlaps it (half-open: aLo < bHi && bLo < aHi).
    * Both sides explode to the fixed-width buckets they cover and
    * equi-join on bucket; the exact predicate re-filters. A pair sharing
    * several buckets would duplicate, so each pair is kept only in its
    * CANONICAL bucket — the one containing max(aLo, bLo), which both
    * intervals necessarily cover — making the output duplicate-free
    * WITHOUT a distinct shuffle. Same scale argument as
    * [[rangeJoinBucketed]]: O(|a| + |b| × spread/bucketWidth) equi-rows
    * instead of a BroadcastNestedLoopJoin. */
  def intervalJoinBucketed(a: DataFrame, aLo: String, aHi: String,
      b: DataFrame, bLo: String, bHi: String, bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def buckets(lo: Column, hi: Column) =
      explode(sequence(floor(lo / bucketWidth).cast("long"),
        floor(hi / bucketWidth).cast("long")))
    val ab = a.withColumn("__bucket", buckets(col(aLo), col(aHi)))
    val bb = b.withColumn("__bucket", buckets(col(bLo), col(bHi)))
    ab.join(bb, Seq("__bucket"))
      .filter(col(aLo) < col(bHi) && col(bLo) < col(aHi))
      .filter(col("__bucket") ===
        floor(greatest(col(aLo), col(bLo)) / bucketWidth).cast("long"))
      .drop("__bucket")
  }

  /** Bucketed range join: pair each point with every interval where
    * `lo <= point < hi`. Intervals explode into the fixed-width buckets
    * they cover, points map to their bucket, equi-join on bucket, then the
    * exact predicate re-filters. Spark's native plan for a pure inequality
    * join is BroadcastNestedLoopJoin — O(|points| x |intervals|) and fatal
    * when neither side broadcasts; this shape is an equi-shuffle of
    * O(|points| + |intervals| x spread/bucketWidth). Pick bucketWidth near
    * the median interval width. Duplicate (point, interval) pairs cannot
    * occur: each point lives in exactly one bucket. */
  def rangeJoinBucketed(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val pb = points.withColumn("__bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    val ib = intervals.withColumn("__bucket",
      explode(sequence(floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    pb.join(ib, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bucket")
  }
}
