package graft

import org.apache.spark.sql.functions._
import graft.functions.{Align, Skew}

/** Skew salting + cross-collection alignment (SURVEY §7.4). */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedAgg: two-stage aggregation matches direct groupBy") {
    val df = (1 to 1000).map(i => (if (i % 10 == 0) "hot" else s"k${i % 7}", i.toDouble))
      .toDF("k", "v").repartition(4)
    val direct = df.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val salted = Skew.saltedAgg(df, col("k"), saltBuckets = 8,
      partials = Seq(sum("v").as("ps"), count(lit(1)).as("pn")),
      merges = Seq(sum("ps").as("s"), sum("pn").as("n")))
      .orderBy("key").collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(salted.toSeq == direct.toSeq)
  }

  test("zipCollections aligns two independent DataFrames positionally") {
    val a = Seq(1, 2, 3).toDF("x").coalesce(1)
    val b = Seq("a", "b", "c").toDF("y").coalesce(1)
    val z = Align.zipCollections(a, b).orderBy("x")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(z.toSeq == Seq((1, "a"), (2, "b"), (3, "c")))
  }

  test("withRowIndex is a stable 0-based index") {
    val df = Seq("p", "q", "r").toDF("s").coalesce(1)
    val idx = Align.withRowIndex(df).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(idx.toSeq == Seq(("p", 0L), ("q", 1L), ("r", 2L)))
  }
}
