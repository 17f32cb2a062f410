package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.queries.{DedupQueries, EventQueries, TextQueries}

/** Laws for q221–q222: crafted two-week drift and vocab-boundary cases
  * plus gate-SF brute-force mirrors.
  */
class Round9gLawsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // ---------------------------------------------------------------- q221

  test("law: q221 crafted — identical mixes drift 0; a full swap " +
    "drifts 1e6; a half swap drifts 500000") {
    val wk = 604800000000L / 1000 // one week in millis
    def t(week: Int, i: Int) = new Timestamp(week * wk + i * 1000L)
    def evs(week: Int, mix: Seq[(String, Int)]) = mix.flatMap {
      case (ty, n) => (0 until n).map(i => (t(week, i), ty))
    }
    // weeks: 0 {a2 b2}, 1 {a2 b2} (tvd 0), 2 {a4} (tvd 500000),
    // 3 {b4} (tvd 1000000)
    val rows = (evs(0, Seq("a" -> 2, "b" -> 2)) ++
      evs(1, Seq("a" -> 2, "b" -> 2)) ++
      evs(2, Seq("a" -> 4)) ++ evs(3, Seq("b" -> 4)))
      .toDF("ts", "event_type")
    val got = EventQueries.mixDriftCore(rows).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.map(_._3) == Seq(0L, 500000L, 1000000L), s"got $got")
    assert(got.map(_._2) == Seq(4L, 4L, 4L))
  }

  test("law: q221 at the gate SF equals a driver-side share mirror") {
    val ev = Tables.events(spark, sf)
      .select(expr("unix_micros(ts)").as("tsu"), col("event_type"))
      .collect().map(r => (r.getLong(0) / 604800000000L, r.getString(1)))
    val types = ev.map(_._2).distinct.sorted
    val byWeek = ev.groupBy(_._1).view.mapValues { g =>
      val n = g.size.toLong
      (n, types.map(t => g.count(_._2 == t).toLong * 1000000L / n))
    }.toMap
    val weeks = byWeek.keys.toSeq.sorted
    val expect = weeks.sliding(2).collect { case Seq(p, c) =>
      val tvd = byWeek(c)._2.zip(byWeek(p)._2)
        .map { case (a, b) => math.abs(a - b) }.sum / 2
      (c, byWeek(c)._1, tvd)
    }.toSeq
    val got = SparkEntry.queries("q221_mix_drift")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(got == expect)
  }

  test("law: q221 gap week — lag pairs ADJACENT OBSERVED weeks per " +
    "type, so a silent week does not zero the drift") {
    val wk = 604800000000L / 1000
    def t(week: Int, i: Int) = new Timestamp(week * wk + i * 1000L)
    // weeks 0 and 5 only (gap): mixes differ by a half swap
    val rows = ((0 until 2).map(i => (t(0, i), "a")) ++
      (0 until 2).map(i => (t(0, i + 2), "b")) ++
      (0 until 4).map(i => (t(5, i), "a")))
      .toDF("ts", "event_type")
    val got = EventQueries.mixDriftCore(rows).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(got.map(_._2) == Seq(500000L), s"got $got")
  }

  // ---------------------------------------------------------------- q222

  test("law: q222 crafted — tokens outside the top-16 vocab count as " +
    "OOV, ties at the cut break by word") {
    // 16 common words (each x3) fill the vocab; 2 rare words are OOV
    val common = (0 until 16).map(i => f"w$i%02d")
    val text = (common ++ common ++ common).mkString(" ")
    val df = Seq(
      ("aa", text + " rare1 rare2"),
      ("bb", text)).toDF("lang", "text")
    val got = TextQueries.vocabCoverageCore(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == Seq(("aa", 50L, 2L, 40000L), ("bb", 48L, 0L, 0L)),
      s"got $got")
  }

  test("law: q222 at the gate SF equals a driver-side top-16 mirror") {
    val docs = Tables.documents(spark, sf).select("lang", "text")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val all = docs.flatMap { case (l, t) => t.split(" ").map(l -> _) }
    val vocab = all.map(_._2).groupBy(identity).toSeq
      .map { case (w, g) => (w, g.length.toLong) }
      .sortBy { case (w, c) => (-c, w) }.take(16).map(_._1).toSet
    val expect = all.groupBy(_._1).toSeq.map { case (lang, g) =>
      val n = g.length.toLong
      val oov = g.count(p => !vocab(p._2)).toLong
      (lang, n, oov, oov * 1000000L / n)
    }.sortBy(_._1)
    val got = SparkEntry.queries("q222_vocab_coverage")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == expect)
  }

  // ---------------------------------------------------------------- q223

  test("law: q223 crafted — each group keeps its longest (ties min id) " +
    "member; ungrouped docs are never dropped; savings are exact") {
    val grp = Seq((1L, 100L), (2L, 100L), (3L, 100L), // group 100
      (10L, 200L), (11L, 200L)) // group 200, tie on length
      .toDF("doc_id", "group_id")
    val docs = Seq(
      (1L, "aa", 50L), (2L, "aa", 80L), (3L, "bb", 80L), // canon: 2
      (10L, "bb", 60L), (11L, "bb", 60L), // tie -> canon 10
      (20L, "aa", 999L)) // ungrouped, kept
      .toDF("doc_id", "source", "n_chars")
    val got = DedupQueries.dedupSavingsCore(grp, docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    // dropped: 1 (aa, 50), 3 (bb, 80), 11 (bb, 60)
    val expect = Seq(
      ("aa", 3L, 1L, 1129L, 50L, 50L * 1000000 / 1129),
      ("bb", 3L, 2L, 200L, 140L, 700000L))
    assert(got == expect, s"got $got")
  }

  test("law: q223 at the gate SF conserves mass — chars_saved < " +
    "chars_total per source and the q111 canonicals are never dropped") {
    val out = SparkEntry.queries("q223_dedup_savings")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty)
    assert(out.forall { case (_, nd, ndrop, ct, cs) =>
      ndrop <= nd && cs < ct })
    // cross-check against q111: total dropped = group members - groups
    val canon = SparkEntry.queries("q111_canonical_docs")(spark, sf)
      .collect().map(r => (r.getLong(1))) // n_members per group
    assert(out.map(_._3).sum == canon.map(_ - 1).sum)
  }
}
