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

  test("Misra-Gries frequent items: guarantee holds under distributed merge") {
    import spark.implicits._
    import graft.functions.Aggregators.FreqItemsAgg
    // Zipf-ish stream: item j appears ~N/j times; n = sum of all
    val n0 = 2000
    val items = (1 to 30).flatMap(j => Seq.fill(n0 / j)(s"t$j"))
    val n = items.size
    val k = 15
    // run DISTRIBUTED over 16 partitions: map-side partials + one merge
    val ds = spark.createDataset(items).repartition(16)
    val sketch = ds.select(new FreqItemsAgg(k).toColumn).head()
    val got = sketch.toMap
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val thresh = n.toDouble / (k + 1)
    // every item with true frequency > n/(k+1) must survive the merge tree
    for ((i, c) <- exact if c > thresh)
      assert(got.contains(i), s"heavy hitter $i (n=$c, thresh=$thresh) lost")
    // and every retained count is an underestimate within the bound
    for ((i, c) <- got) {
      assert(c <= exact(i), s"$i overcounted: $c > ${exact(i)}")
      assert(c >= exact(i) - thresh, s"$i undercounted beyond bound")
    }
    // state is bounded at k counters
    assert(got.size <= k)
  }

  test("Misra-Gries over the documents vocabulary matches exact top terms") {
    import spark.implicits._
    import graft.functions.Aggregators.FreqItemsAgg
    val words = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
    val n = words.count()
    val k = 64
    val sketch = words.as[String].select(new FreqItemsAgg(k).toColumn)
      .head().toMap
    val exact = words.groupBy("w").count()
      .filter(col("count") > n / (k + 1.0))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the guaranteed heavy hitters are exactly the oracle-exact ones
    for ((w, c) <- exact) {
      assert(sketch.contains(w), s"corpus heavy hitter $w lost")
      assert(sketch(w) <= c && sketch(w) >= c - n / (k + 1.0),
        s"$w count ${sketch(w)} outside [${c - n / (k + 1.0)}, $c]")
    }
  }
}
