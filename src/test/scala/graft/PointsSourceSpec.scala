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

  test("nested ops run over the custom source") {
    val df = read(30, 2).select(col("row_id"),
      graft.functions.ArrayOps.num(col("points")).as("n"),
      transform(col("points"), p => p.getField("x")).as("xs"))
    assert(df.count() == 30)
    assert(df.filter(col("n") === size(col("xs"))).count() == 30)
  }
}
