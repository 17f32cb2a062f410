package graft

import org.apache.spark.sql.functions._

/** DataSourceV2 with projection pushdown (the reference's from_map +
  * project protocol; reference asserts necessary-columns sets in
  * test_inspect.py — here we assert the scan's pruned readSchema). */
class PointsSourceSpec extends SparkSpec {

  private def read(rows: Int, parts: Int) =
    spark.read.format("graft.sources.PointsSource")
      .option("rows", rows).option("partitions", parts).load()

  test("reads deterministic jagged rows with declared partitioning") {
    val df = read(100, 8)
    assert(df.rdd.getNumPartitions == 8)
    assert(df.count() == 100)
    val again = read(100, 8).orderBy("row_id")
      .select(col("row_id"), size(col("points")).as("n")).collect()
    val once = read(100, 8).orderBy("row_id")
      .select(col("row_id"), size(col("points")).as("n")).collect()
    assert(once.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    assert(once.map(_.getInt(1)).distinct.sorted.toSeq.forall(n => n >= 0 && n <= 3))
  }

  test("column pruning pushes into the custom scan") {
    val df = read(50, 4).select("row_id", "label")
    val scan = df.queryExecution.executedPlan.collectLeaves().head
    val outCols = scan.output.map(_.name)
    assert(outCols.toSet == Set("row_id", "label"),
      s"points not pruned from scan output: $outCols")
    assert(df.count() == 50)
  }

  test("row_id range filters prune input partitions (min/max skipping)") {
    // 100 rows / 4 partitions of 25: row_id >= 80 leaves only [80,100)
    val full = read(100, 4)
    assert(full.rdd.getNumPartitions == 4)
    val pruned = full.filter(col("row_id") >= 80)
    assert(pruned.rdd.getNumPartitions == 1,
      "range filter should prune 3 of 4 partitions")
    assert(pruned.count() == 20)
    assert(pruned.agg(min("row_id")).head.getLong(0) == 80L)
    // residual predicates still apply post-scan
    val mixed = full.filter(col("row_id") >= 80 && col("label") === "p85")
    assert(mixed.count() == 1)
    // equality narrows to a single-row partition
    val one = full.filter(col("row_id") === 42)
    assert(one.rdd.getNumPartitions == 1 && one.count() == 1)
  }

  test("Long.MaxValue bounds don't wrap to select-everything (ADVICE r2)") {
    val full = read(100, 4)
    // `> MaxValue` used to compute lo = MaxValue + 1 = MinValue -> all rows
    assert(full.filter(col("row_id") > Long.MaxValue).count() == 0)
    assert(full.filter(col("row_id") === Long.MaxValue).count() == 0)
    // `<= MaxValue` is everything (hi saturates, no wrap)
    assert(full.filter(col("row_id") <= Long.MaxValue).count() == 100)
  }

  test("statistics report post-pushdown row count (small pruned side broadcasts)") {
    // 1000-row table pruned to 10 rows by a range predicate: the reported
    // stats must reflect the pruning, so the planner broadcasts this side
    val small = read(1000, 8).filter(col("row_id") >= 990)
      .select(col("row_id"))
    val big = read(1000, 8).select(col("row_id").as("rid"))
    val joined = big.join(small, col("rid") === col("row_id"))
    assert(Inspect.hasBroadcast(joined),
      Inspect.explainString(joined))
    assert(joined.count() == 10)
  }

  test("nested ops run over the custom source") {
    val df = read(30, 2).select(col("row_id"),
      graft.functions.ArrayOps.num(col("points")).as("n"),
      transform(col("points"), p => p.getField("x")).as("xs"))
    assert(df.count() == 30)
    assert(df.filter(col("n") === size(col("xs"))).count() == 30)
  }
}
