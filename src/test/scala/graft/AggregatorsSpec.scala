package graft

import org.apache.spark.sql.functions._
import graft.functions.Aggregators

/** Custom typed aggregations (reference custom-reduction surface,
  * core.py:2349-2457) + partitioning ops (§1.4: repartition schemes,
  * partitions[i] selection). */
class AggregatorsSpec extends SparkSpec {
  import spark.implicits._

  test("WeightedMean merges partials exactly") {
    val ds = Seq((10.0, 1.0), (20.0, 3.0), (30.0, 0.0)).toDS().repartition(3)
    val got = ds.select(Aggregators.WeightedMean.toColumn).head()
    assert(math.abs(got - 70.0 / 4.0) < 1e-12)
  }

  test("MinKAgg keeps the k smallest across partitions (bounded state)") {
    val ds = spark.range(0, 1000).map(i => (i * 2654435761L) % 1000003L)
      .repartition(8)
    val got = ds.select(new Aggregators.MinKAgg(5).toColumn).head()
    val expected = ds.collect().sorted.take(5).toSeq
    assert(got == expected)
  }

  test("repartition schemes: npartitions, coalesce n_to_one, range") {
    val df = spark.range(0, 100).toDF("i").repartition(10)
    assert(df.rdd.getNumPartitions == 10)
    assert(df.coalesce(2).rdd.getNumPartitions == 2)       // n_to_one, no shuffle
    val ranged = df.repartitionByRange(4, col("i"))
    assert(ranged.rdd.getNumPartitions == 4)
    // range partitions hold contiguous key ranges (the reference's
    // divisions semantics)
    val bounds = ranged.withColumn("p", spark_partition_id())
      .groupBy("p").agg(min("i").as("lo"), max("i").as("hi"))
      .orderBy("lo").collect().map(r => (r.getLong(1), r.getLong(2)))
    bounds.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2)
      case _ =>
    }
  }

  test("partitions[i] selection via spark_partition_id") {
    val df = spark.range(0, 100).toDF("i").repartition(5)
    val p2 = df.withColumn("p", spark_partition_id()).filter(col("p") === 2)
    assert(p2.count() > 0 && p2.count() < 100)
  }
}
