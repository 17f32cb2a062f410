package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.queries.{DedupQueries, EventQueries, PipelineQueries, TextQueries}

/** Laws for the round-9 batch q208–q211: crafted-input cases that the
  * gate SFs cannot reach (exact chunk boundaries, the winnowing
  * guarantee, an exactly-1.0 collocation, a user pinned at the cap) plus
  * gate-SF brute-force mirrors independent of the DuckDB oracle.
  */
class Round9cLawsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // ---------------------------------------------------------------- q208

  /** Driver-side mirror of the 32/24 chunker over a token list. */
  private def chunksOf(ws: Seq[String]): Seq[String] = {
    val bound = math.max(ws.length - 8, 1)
    (0 until bound by 24).map(st => ws.slice(st, st + 32).mkString(" "))
  }

  test("law: q208 chunk starts — 9 tokens = 1 chunk, 32 = 1, 33 = 2, " +
    "40 = 2, and every token is covered by some chunk") {
    for (n <- Seq(1, 8, 9, 24, 32, 33, 40, 100)) {
      val ws = (1 to n).map(i => s"t$i")
      val cs = chunksOf(ws)
      val expect = math.max(math.ceil(math.max(n - 8, 1) / 24.0).toInt, 1)
      assert(cs.length == expect, s"n=$n got ${cs.length} chunks")
      assert(cs.flatMap(_.split(" ")).toSet == ws.toSet,
        s"n=$n lost tokens")
    }
    // consecutive chunks overlap by exactly 8 tokens when full-width
    val cs = chunksOf((1 to 64).map(i => s"t$i"))
    val (a, b) = (cs(0).split(" ").toSeq, cs(1).split(" ").toSeq)
    assert(a.takeRight(8) == b.take(8))
  }

  test("law: q208 at the gate SF equals a driver-side chunk mirror " +
    "(string equality — also proves the 60-bit hash is collision-free)") {
    val docs = Tables.documents(spark, sf).select("source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val chunks = docs.flatMap { case (src, t) =>
      val ws = t.split(" ").toSeq
      if (ws.isEmpty) Nil else chunksOf(ws).map(src -> _)
    }
    val byChunk = chunks.groupBy(_._2)
    val nHashes = byChunk.size.toLong
    val nChunks = chunks.length.toLong
    val dup = byChunk.values.map(g => g.size - 1L).sum
    val xsrc = byChunk.values.count(g => g.map(_._1).distinct.size > 1)
    val got = SparkEntry.queries("q208_rag_chunking")(spark, sf)
      .collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2),
      got.getLong(3)) == ((nHashes, nChunks, dup, xsrc.toLong)))
  }

  // ---------------------------------------------------------------- q209

  test("law: q209 winnowing guarantee — two docs sharing a run of " +
    "w+k-1 = 8 tokens share a fingerprint; disjoint docs share none") {
    val shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    val df = Seq(
      1L -> s"a1 a2 a3 $shared a4 a5",
      2L -> s"b1 $shared b2 b3 b4 b5 b6",
      3L -> "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10").toDF("doc_id", "text")
    val fps = DedupQueries.winnowFps(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val by = fps.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((by(1L) & by(2L)).nonEmpty, "shared 8-run must share a fp")
    assert((by(1L) & by(3L)).isEmpty && (by(2L) & by(3L)).isEmpty)
  }

  test("law: q209 density — per doc, #fps <= #complete windows and " +
    "every fp is one of the doc's 5-gram hashes (gate SF)") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .filter(_._2.split(" ").length >= 5)
    // per-doc kgram hashes from the engine's own kernel
    val kh = Tables.documents(spark, sf)
      .select(col("doc_id"),
        posexplode(graft.functions.TextOps.shingles(
          split(col("text"), " "), 5)).as(Seq("p", "g")))
      .select(col("doc_id"), col("p"),
        call_function("md5_prefix60", col("g")).as("h"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1)
    // driver-side winnowing mirror (docs with < 8 tokens have no
    // complete window and emit nothing — mirrored by the empty filter)
    val expect = kh.map { case (id, rows) =>
      val hs = rows.sortBy(_._2).map(_._3)
      val nk = hs.length
      val fps = (0 to nk - 4).map(p => hs.slice(p, p + 4).min).toSet
      id -> fps
    }.filter(_._2.nonEmpty)
    val got = DedupQueries.winnowFps(
      Tables.documents(spark, sf).select("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(got == expect.toMap)
    for ((id, fps) <- expect) {
      val windows = kh(id).length - 3
      assert(fps.size <= windows, s"doc $id fp density")
    }
    assert(docs.map(_._1).toSet.subsetOf(kh.keySet))
  }

  // ---------------------------------------------------------------- q210

  test("law: q210 an always-paired bigram scores exactly 1.0 and ranks " +
    "first; every score obeys the Cauchy-Schwarz bound <= 1") {
    // "xx yy" appears 3x and nowhere else; xx/yy appear only in it.
    val df = Seq(
      "xx yy pad1", "pad2 xx yy", "xx yy pad3",
      "pad1 pad2 pad1 pad2 pad1 pad2").toDF("text")
    val got = TextQueries.collocations(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.head == (("xx yy", 3L, 1.0)), s"got ${got.head}")
    assert(got.forall(_._3 <= 1.0))
    assert(got.map(_._3).toSeq == got.map(_._3).toSeq.sorted.reverse)
  }

  test("law: q210 at the gate SF equals a driver-side count mirror") {
    val texts = Tables.documents(spark, sf).select("text")
      .collect().map(_.getString(0))
    val uni = texts.flatMap(_.split(" ")).groupBy(identity)
      .view.mapValues(_.length.toLong).toMap
    val big = texts.map(_.split(" ").toSeq).filter(_.length >= 2)
      .flatMap(ws => ws.sliding(2).map(_.mkString(" ")))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expect = big.toSeq.filter(_._2 >= 3L).map { case (b, c12) =>
      val Array(w1, w2) = b.split(" ", 2)
      (b, c12, c12.toDouble * c12 / uni(w1) / uni(w2))
    }.sortBy { case (b, _, sc) => (-sc, b) }.take(64)
    val got = SparkEntry.queries("q210_collocations")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    assert(got == expect)
  }

  // ---------------------------------------------------------------- q211

  test("law: q211 crafted — a 10-event user clips to 8 newest; ppm is " +
    "floor((pre-post)*1e6/pre)") {
    val base = Timestamp.valueOf("2026-01-01 00:00:00")
    def t(m: Int) = new Timestamp(base.getTime + m * 60000L)
    val rows = (1 to 10).map(i => (i.toLong, t(i), 7L, "click")) ++
      Seq((100L, t(1), 8L, "view"), (101L, t(2), 8L, "view"))
    val got = EventQueries.contributionCap(
      rows.toDF("event_id", "ts", "user_id", "event_type"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == Seq(("click", 10L, 8L, 200000L), ("view", 2L, 2L, 0L)))
  }

  test("law: q211 at the gate SF equals a driver-side cap mirror") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), expr("unix_micros(ts)").as("tsu"),
        col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    val kept = ev.groupBy(_._3).values.flatMap { g =>
      g.sortBy { case (id, tsu, _, _) => (-tsu, -id) }.take(8)
    }.toSeq
    val pre = ev.groupBy(_._4).view.mapValues(_.length.toLong).toMap
    val post = kept.groupBy(_._4).view.mapValues(_.length.toLong).toMap
    val expect = pre.keys.toSeq.sorted.map { et =>
      val (np, npo) = (pre(et), post.getOrElse(et, 0L))
      (et, np, npo, (np - npo) * 1000000L / np)
    }
    val got = SparkEntry.queries("q211_contribution_cap")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == expect)
  }
}
