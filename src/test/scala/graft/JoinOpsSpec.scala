package graft

import org.apache.spark.sql.functions._
import graft.functions.JoinOps

/** As-of and range joins — semantics (ties, no-match, bucket edges) and
  * the plan property that motivates them: no BroadcastNestedLoopJoin. */
class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  test("asofBackward: latest at-or-before match per key, null when none") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 100.0), (1L, 15L, 150.0), (2L, 9L, 90.0))
      .toDF("k", "t", "v")
    val got = JoinOps.asofBackward(left, right, key = "k", ts = "t")
      .orderBy("k", "t")
      .select("k", "t", "tag", "t_r", "v_r")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1.0 else r.getDouble(4))).toSeq
    assert(got == Seq(
      (1L, 10L, "a", 10L, 100.0),  // equal ts matches (>= bound)
      (1L, 20L, "b", 15L, 150.0),  // latest of the two earlier rights
      (2L, 5L, "c", -1L, -1.0)))   // right exists only later -> no match
  }

  test("asofBackward: null-ts right rows dropped; (key,ts) ties deterministic") {
    val left = Seq((1L, 10L, "a")).toDF("k", "t", "tag")
    // a null-ts right row would sort nulls-first and get carried forward as
    // a bogus match without the filter (ADVICE r2); DuckDB ASOF drops it
    val right = Seq((1L, Option.empty[Long], 666.0), (1L, Some(5L), 50.0))
      .toDF("k", "t", "v")
    val got = JoinOps.asofBackward(left, right, "k", "t")
      .select("v_r").collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(50.0))
    // two right rows share (k, ts): the __r-struct tiebreaker must pick the
    // same one on every run — the greatest by struct ordering (last in the
    // window's ascending order)
    val tied = Seq((1L, 10L, 1.0), (1L, 10L, 9.0), (1L, 10L, 4.0))
      .toDF("k", "t", "v")
    (1 to 3).foreach { _ =>
      val v = JoinOps.asofBackward(left, tied.repartition(4), "k", "t")
        .select("v_r").collect().map(_.getDouble(0)).toSeq
      assert(v == Seq(9.0))
    }
  }

  test("asofBackwardNative: same semantics as the window form (unit cases)") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 100.0), (1L, 15L, 150.0), (2L, 9L, 90.0))
      .toDF("k", "t", "v")
    val got = JoinOps.asofBackwardNative(left, right, key = "k", ts = "t")
      .orderBy("k", "t")
      .select("k", "t", "tag", "t_r", "v_r")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1.0 else r.getDouble(4))).toSeq
    assert(got == Seq(
      (1L, 10L, "a", 10L, 100.0),
      (1L, 20L, "b", 15L, 150.0),
      (2L, 5L, "c", -1L, -1.0)))
    // null-ts right rows dropped, exactly like the window form
    val l1 = Seq((1L, 10L, "a")).toDF("k", "t", "tag")
    val r1 = Seq((1L, Option.empty[Long], 666.0), (1L, Some(5L), 50.0))
      .toDF("k", "t", "v")
    assert(JoinOps.asofBackwardNative(l1, r1, "k", "t")
      .select("v_r").collect().map(_.getDouble(0)).toSeq == Seq(50.0))
    // null-ts LEFT rows survive unmatched
    val ln = Seq((1L, Option.empty[Long], "x")).toDF("k", "t", "tag")
    val gotN = JoinOps.asofBackwardNative(ln,
      Seq((1L, 5L, 50.0)).toDF("k", "t", "v"), "k", "t").collect()
    assert(gotN.length == 1 && gotN.head.isNullAt(gotN.head.fieldIndex("v_r")))
  }

  test("asofBackwardNative EQUALS asofBackward on the events table (self-join)") {
    // the q89 inputs: both sides carved from ONE table — exercises the
    // fresh-alias dedup, multi-partition merge, and AQE-coalesced shuffles
    val sf = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "ts", "value")
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_id"), col("user_id"),
        col("ts_r").cast("long").as("tsr"), col("value_r"))
      .orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3))).toSeq
    val window = canon(JoinOps.asofBackward(purchases, clicks, "user_id", "ts"))
    val native = canon(
      JoinOps.asofBackwardNative(purchases, clicks, "user_id", "ts"))
    assert(native.nonEmpty && native == window)
  }

  test("asofBackwardNative plans exchanges+sorts, no window, no nested loop") {
    val left = Seq((1L, 10L, "a")).toDF("k", "t", "tag")
    val right = Seq((1L, 5L, 1.0)).toDF("k", "t", "v")
    val plan = JoinOps.asofBackwardNative(left, right, "k", "t")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoop"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("asofBackwardNative advertises partitioning: downstream groupBy(key) adds no exchange") {
    val left = Seq((1L, 10L, 2.0), (2L, 20L, 3.0)).toDF("k", "t", "v")
    val right = Seq((1L, 5L, 1.0)).toDF("k", "t", "v")
    val agged = JoinOps.asofBackwardNative(left, right, "k", "t")
      .groupBy("k").agg(sum("v_r").as("s"))
    val plan = agged.queryExecution.executedPlan.toString
    // exactly the two exchanges feeding the join — the aggregate reuses
    // the advertised hash partitioning instead of adding a third
    val exchanges = "(?<!Broadcast)Exchange hash".r.findAllIn(plan).size
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges:\n$plan")
  }

  test("asofBackward compiles to one hash shuffle, no nested loop") {
    val left = Seq((1L, 10L, "a")).toDF("k", "t", "tag")
    val right = Seq((1L, 9L, 1.0)).toDF("k", "t", "v")
    val plan = Inspect.explainString(
      JoinOps.asofBackward(left, right, "k", "t"))
    assert(!plan.contains("NestedLoop"), plan)
    assert(plan.contains("Window"), plan)
  }

  test("intervalJoinBucketed matches naive overlap join, duplicate-free") {
    // intervals spanning several buckets, touching endpoints (half-open:
    // no match), negatives, and containment
    val a = Seq((0L, 0.0, 25.0), (1L, -13.0, -2.0), (2L, 5.0, 6.0),
      (3L, 30.0, 40.0)).toDF("aid", "a_lo", "a_hi")
    val b = Seq((10L, 24.0, 31.0), (11L, -5.0, 0.0), (12L, 4.0, 50.0),
      (13L, 25.0, 30.0)).toDF("bid", "b_lo", "b_hi")
    val naive = a.crossJoin(b)
      .filter(col("a_lo") < col("b_hi") && col("b_lo") < col("a_hi"))
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val got = JoinOps.intervalJoinBucketed(a, "a_lo", "a_hi", b, "b_lo", "b_hi",
      bucketWidth = 7.0)
    val pairs = got.select("aid", "bid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == naive)
    // canonical-bucket dedup: no duplicates even for pairs sharing buckets
    assert(pairs.length == pairs.toSet.size)
    assert(naive.contains((0L, 12L)) && !naive.contains((0L, 13L)))
    val plan = Inspect.explainString(got)
    assert(!plan.contains("NestedLoop"), plan)
  }

  test("rangeJoinBucketed matches the naive inequality join") {
    val points = (0 until 200).map(i => (i.toLong, i * 3.7 % 97))
      .toDF("id", "x")
    val intervals = Seq((0L, 0.0, 10.0), (1L, 5.0, 50.0), (2L, 50.0, 97.0),
      (3L, 200.0, 300.0)).toDF("tier", "lo", "hi")
    val naive = points.crossJoin(intervals)
      .filter(col("x") >= col("lo") && col("x") < col("hi"))
      .select("id", "tier").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val bucketed = JoinOps
      .rangeJoinBucketed(points, "x", intervals, "lo", "hi", bucketWidth = 8.0)
      .select("id", "tier").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(bucketed == naive)
    assert(bucketed.nonEmpty)
    // no duplicate pairs: each point is in exactly one bucket
    val n = JoinOps.rangeJoinBucketed(points, "x", intervals, "lo", "hi", 8.0)
      .count()
    assert(n == bucketed.size)
  }

  test("rangeJoinBucketed handles negative values (floor-based buckets)") {
    val points = Seq((0L, -7.5), (1L, -0.1), (2L, 0.0), (3L, 4.9))
      .toDF("id", "x")
    val intervals = Seq((0L, -10.0, 0.0), (1L, 0.0, 5.0)).toDF("tier", "lo", "hi")
    val got = JoinOps.rangeJoinBucketed(points, "x", intervals, "lo", "hi", 3.0)
      .select("id", "tier").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    // [lo, hi): -7.5 and -0.1 in tier 0; 0.0 and 4.9 in tier 1
    assert(got == Set((0L, 0L), (1L, 0L), (2L, 1L), (3L, 1L)))
  }

  test("saltedJoin equals the plain equi-join (salting semantically invisible)") {
    // a pathologically hot key: 900 of 1000 fact rows share key "hot"
    val fact = (0 until 1000).map(i =>
      (i.toLong, if (i < 900) "hot" else s"k${i % 7}")).toDF("id", "key")
    val dim = Seq(("hot", 1L), ("k0", 2L), ("k1", 3L), ("k2", 4L),
      ("k3", 5L), ("k4", 6L), ("k5", 7L), ("k6", 8L)).toDF("key", "v")
    val salted = graft.functions.Skew.saltedJoin(fact, dim, "key", 8)
      .select("id", "v").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val plain = fact.join(dim, "key")
      .select("id", "v").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(salted == plain && salted.size == 1000)
  }
}
