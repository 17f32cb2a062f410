package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located join: pre-partitioning both fact tables on the join
  * key lets the join run with ZERO exchanges — the scale story for repeated
  * joins over the same key at 100 TB (pay the shuffle once at write time).
  */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables plans without a shuffle") {
    val sf = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")

    Tables.lineitem(spark, sf)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    Tables.orders(spark, sf)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_b")

    val joined = spark.table("li_b")
      .join(spark.table("ord_b").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must not exchange either side (bucket pruning works);
    // only the final low-volume groupBy may shuffle
    val joinSection = plan.split("HashAggregate").last
    assert(joinSection.contains("SortMergeJoin") || plan.contains("SortMergeJoin"),
      s"expected sort-merge join over buckets:\n$plan")
    assert(!joinSection.contains("Exchange"),
      s"join should be exchange-free over co-bucketed tables:\n$plan")

    // and it is correct
    val direct = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .orderBy("o_orderpriority").collect().map(r => (r.getString(0), r.getLong(1)))
    val bucketed = joined.orderBy("o_orderpriority").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(bucketed.toSeq == direct.toSeq)

    spark.sql("DROP TABLE li_b")
    spark.sql("DROP TABLE ord_b")
  }
}
