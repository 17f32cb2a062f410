package graft

import org.apache.spark.sql.functions._

/** Sketch accuracy: HLL++ and quantile-sketch estimates stay within their
  * documented error bounds of the exact answers (exactness is the oracle
  * gate's job; sketches trade bounded error for shuffle-free scale). */
class SketchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("approx_count_distinct within 5% of exact") {
    val li = Tables.lineitem(spark, sf)
    val exact = li.agg(countDistinct("l_partkey")).head.getLong(0)
    val approx = li.agg(approx_count_distinct(col("l_partkey"))).head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("percentile_approx within 2% of exact median") {
    val li = Tables.lineitem(spark, sf)
    val exact = li.agg(percentile(col("l_extendedprice"), lit(0.5)))
      .head.getDouble(0)
    val approx = li.agg(
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)))
      .head.getDouble(0)
    assert(math.abs(approx - exact) / exact < 0.02, s"approx=$approx exact=$exact")
  }
}
