package graft

import java.sql.Timestamp

import graft.queries.{DedupQueries, EventQueries, PipelineQueries,
  TextQueries}

/** Laws for the round-11 operators (q240–q247): each a crafted frame
  * with a hand-computed closed form, exercising the semantics the
  * gate's synthetic corpus cannot pin down (exact burst shapes, planted
  * steps, cliques vs paths, identical vs disjoint sketch sources,
  * prefix-only vs suffix-only embedding mass).
  */
class Round11LawsSpec extends SparkSpec {
  import spark.implicits._

  private def at(hour: Long, s: Int): Timestamp =
    Timestamp.from(java.time.Instant.ofEpochSecond(hour * 3600L + s))

  // ---------------------------------------------------------------- q242

  test("law: q242 one-event-per-hour stream is exactly Poisson-flat — " +
    "Fano 0 (hh·ss = n² when every active hour holds one event)") {
    val rows = (0 until 5).map(h => (at(h.toLong, 1), "click", 1L))
    val got = EventQueries.burstinessCore(
      rows.toDF("ts", "event_type", "user_id")).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == (("click", 0L, 1L, 5L, 0L)), s"got $r")
  }

  test("law: q242 planted burst — 3 events in hour 0 + 1 in hour 3: " +
    "hh=4, n=4, ss=10 ⇒ Fano·1e6 = 24e6/16 = 1500000 (bucket 30)") {
    val rows = (1 to 3).map(i => (at(0L, i), "view", 9L)) :+
      ((at(3L, 1), "view", 9L))
    val got = EventQueries.burstinessCore(
      rows.toDF("ts", "event_type", "user_id")).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((30L, 1L, 4L, 1500000L)), s"got $r")
  }

  // ---------------------------------------------------------------- q243

  private def onDay(day: Long, s: Int): Timestamp =
    Timestamp.from(java.time.Instant.ofEpochSecond(day * 86400L + s))

  test("law: q243 constant daily rate — S_t ≡ 0 everywhere, argmax " +
    "tie-breaks to day 1 with cusum_ppm 0 and direction +1") {
    val rows = for (d <- 0 until 5; i <- 1 to 2)
      yield (onDay(d.toLong, i), "click")
    val got = EventQueries.cusumChangepointCore(
      rows.toDF("ts", "event_type")).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5)) == ((5L, 10L, 1L, 1L, 0L)), s"got $r")
  }

  test("law: q243 planted step — 1/day for 4 days then 3/day for 4: " +
    "peak |S| at the step day (t=4), direction −1, ppm = 32e6/128") {
    val rows =
      (0 until 4).map(d => Seq((onDay(d.toLong, 1), "e"))).flatten ++
        (for (d <- 4 until 8; i <- 1 to 3) yield (onDay(d.toLong, i), "e"))
    val got = EventQueries.cusumChangepointCore(
      rows.toDF("ts", "event_type")).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5)) == ((8L, 16L, 4L, -1L, 250000L)), s"got $r")
  }

  test("law: q243 gap days count as zeros — events on days 0 and 4 " +
    "only: the spine stretches n_days to 5") {
    val rows = Seq((onDay(0L, 1), "e"), (onDay(4L, 1), "e"))
    val got = EventQueries.cusumChangepointCore(
      rows.toDF("ts", "event_type")).collect()
    assert(got.length == 1)
    assert(got.head.getLong(1) == 5L, s"got ${got.head}")
  }

  // ---------------------------------------------------------------- q244

  test("law: q244 all-consonant doc grades 0 with spw_ppm 0; cpw_ppm " +
    "is exact chars·1e6/words") {
    val got = TextQueries.lexicalComplexityCore(
      Seq(("s0", "bcd fgh")).toDF("source", "text")).collect()
    assert(got.length == 1)
    val r = got.head
    // 7 chars, 2 words: cpw = 3.5e6
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6)) ==
      ((0L, 1L, 2L, 0L, 0L, 3500000L)), s"got $r")
  }

  test("law: q244 vowel-group runs, not vowels — 'aaa bee' has y=2 " +
    "over w=2: spw_ppm exactly 1e6, grade 4") {
    val got = TextQueries.lexicalComplexityCore(
      Seq(("s0", "aaa bee")).toDF("source", "text")).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(1), r.getLong(4), r.getLong(5)) ==
      ((4L, 2L, 1000000L)), s"got $r")
  }

  // ---------------------------------------------------------------- q245

  test("law: q245 an all-same-char doc is maximally repetitive — " +
    "'aaaa': ssq=9 over n²=9 ⇒ rep_ppm exactly 1e6 (bucket 125)") {
    val got = TextQueries.charDiversityCore(
      Seq(("s0", "aaaa")).toDF("source", "text")).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((125L, 1L, 3L, 1000000L)), s"got $r")
  }

  test("law: q245 all-distinct bigrams — 'abcd': rep_ppm = ⌊3e6/9⌋ = " +
    "333333; a sub-2-char doc is excluded entirely") {
    val got = TextQueries.charDiversityCore(
      Seq(("s0", "abcd"), ("s0", "x")).toDF("source", "text")).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(1), r.getLong(2), r.getLong(4)) ==
      ((41L, 1L, 333333L)), s"got $r")
  }

  test("law: q245 kernel == explicit bigram count on a supplementary-" +
    "plane string (code points, not UTF-16 units)") {
    // "😀a😀a" code-point bigrams: (😀a), (a😀), (😀a) → Σf² = 4+1 = 5
    val df = Seq(Tuple1("😀a😀a")).toDF("t")
    val got = df.selectExpr("bigram_sq_sum(t)").head().getLong(0)
    assert(got == 5L, s"got $got")
  }

  // ---------------------------------------------------------------- q240

  test("law: q240 textually identical sources — exact AND estimated " +
    "Jaccard are 1e6 with err 0") {
    val text = (1 to 40).map(i => s"w$i").mkString(" ")
    val got = DedupQueries.kmvOverlapCore(
      Seq(("a", text), ("b", text)).toDF("source", "text")).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(5), r.getLong(6), r.getLong(7)) ==
      ((1000000L, 1000000L, 0L)), s"got $r")
  }

  test("law: q240 disjoint vocabularies — exact and estimated Jaccard " +
    "both 0") {
    val ta = (1 to 40).map(i => s"a$i").mkString(" ")
    val tb = (1 to 40).map(i => s"b$i").mkString(" ")
    val got = DedupQueries.kmvOverlapCore(
      Seq(("a", ta), ("b", tb)).toDF("source", "text")).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)) ==
      ((0L, 0L, 0L, 0L)), s"got $r")
  }

  // ---------------------------------------------------------------- q241

  test("law: q241 a 3-clique closes its only wedge — closure_ppm 1e6") {
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("id_a", "id_b")
    val lab = Seq((1L, 0), (2L, 0), (3L, 0)).toDF("vec_id", "label")
    val got = DedupQueries.triangleCensusCore(e, lab, "shuffle_hash")
      .collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((0L, 1L, 1L, 1000000L)), s"got $r")
  }

  test("law: q241 a path closes nothing — closure_ppm 0; labels group " +
    "by the wedge ROOT's label") {
    val e = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val lab = Seq((1L, 7), (2L, 8), (3L, 9)).toDF("vec_id", "label")
    val got = DedupQueries.triangleCensusCore(e, lab, "shuffle_hash")
      .collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((7L, 1L, 0L, 0L)), s"got $r")
  }

  test("law: q241 join strategy is output-invariant — the corpus-scale " +
    "merge path (engaged above 2^18 vectors, e.g. the 1000x replica) " +
    "produces byte-identical rows to the gate SFs' shuffled-hash path") {
    val sfDir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 6L)).toDF("id_a", "id_b")
    val lab = (1L to 6L).map(i => (i, (i % 2).toInt))
      .toDF("vec_id", "label")
    val shj = DedupQueries.triangleCensusCore(edges, lab, "shuffle_hash")
      .collect().toSeq
    val smj = DedupQueries.triangleCensusCore(edges, lab, "merge")
      .collect().toSeq
    assert(shj == smj, s"shj=$shj smj=$smj")
    assert(e.count() > 0) // fixture sanity
  }

  // ---------------------------------------------------------------- q246

  test("law: q246 n identical docs in one batch collide all C(n,2) " +
    "pairs — coll_ppm 1e6 at every batch size (n ≤ every size)") {
    val text = (1 to 10).map(i => s"t$i").mkString(" ")
    val rows = (1L to 4L).map(i => (i, text))
    val got = PipelineQueries.batchCollisionCore(
      rows.toDF("doc_id", "text")).collect()
    assert(got.length == 3)
    got.foreach { r =>
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)) == ((1L, 6L, 6L, 1L, 1000000L)), s"got $r")
    }
  }

  test("law: q246 all-distinct docs — dup_pairs 0 and coll_ppm 0") {
    val rows = (1L to 6L).map(i =>
      (i, (1 to 10).map(j => s"d${i}w$j").mkString(" ")))
    val got = PipelineQueries.batchCollisionCore(
      rows.toDF("doc_id", "text")).collect()
    assert(got.length == 3)
    got.foreach { r =>
      assert((r.getLong(2), r.getLong(3), r.getLong(5)) ==
        ((0L, 0L, 0L)), s"got $r")
    }
  }

  // ---------------------------------------------------------------- q248

  test("law: q248 null effect — balanced users with identical metrics " +
    "give T_obs = 0, so every lane ties or beats it: p_ppm = 1e6") {
    val rows = (0L until 10L).map(u => (at(u, 1), "click", u))
    val got = EventQueries.abPermutationCore(
      rows.toDF("ts", "event_type", "user_id")).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((10L, 0L, 1000000L)), s"got $r")
  }

  test("law: q248 planted uniform effect — even users carry 10 events, " +
    "odd users 1: p matches the exact lane-by-lane replay of the " +
    "multiplicative sign draw (differential golden)") {
    val rows = (0L until 40L).flatMap { u =>
      val k = if (u % 2 == 0) 10 else 1
      (1 to k).map(i => (at(u, i), "view", u))
    }
    val got = EventQueries.abPermutationCore(
      rows.toDF("ts", "event_type", "user_id")).collect()
    assert(got.length == 1)
    // replay: per user h = md5_prefix64("ab|u"), lane sign as in the core
    val users = (0L until 40L).map { u =>
      val h = graft.plans.Md5Prefix64.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"ab|$u"))
      val m = if (u % 2 == 0) 10L else 1L
      (u, h, m)
    }
    val tObs = users.map { case (u, _, m) =>
      if (u % 2 == 0) m else -m }.sum
    val cnt = (0 until 256).count { k =>
      val t = users.map { case (_, h, m) =>
        if ((h * (2L * k + 3L)) % 1000003L % 2L == 0L) m else -m }.sum
      math.abs(t) >= math.abs(tObs)
    }
    val r = got.head
    assert((r.getLong(2), r.getLong(3)) ==
      ((tObs, cnt.toLong * 1000000L / 256L)), s"got $r expected cnt=$cnt")
  }

  // ---------------------------------------------------------------- q249

  test("law: q249 a purchase 25 h after the only click attributes to " +
    "'none' on both first and last touch") {
    val rows = Seq(
      (at(0L, 0), "click", 1L),
      (at(25L, 0), "purchase", 1L))
    val got = EventQueries.attributionCore(
      rows.toDF("ts", "event_type", "user_id")).collect()
    assert(got.map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet == Set(("first", "none", 1L), ("last", "none", 1L)))
  }

  test("law: q249 view-then-click within the window splits first vs " +
    "last; a same-timestamp tie breaks by code — min (first) to " +
    "click (1), max (last) to view (2)") {
    val rows = Seq(
      (at(1L, 0), "view", 1L),
      (at(2L, 0), "click", 1L),
      (at(3L, 0), "purchase", 1L),
      // user 2: click and view at the SAME microsecond, then purchase
      (at(1L, 5), "click", 2L),
      (at(1L, 5), "view", 2L),
      (at(2L, 0), "purchase", 2L))
    val got = EventQueries.attributionCore(
      rows.toDF("ts", "event_type", "user_id")).collect()
    val m = got.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(m == Map(("first", "view") -> 1L, ("first", "click") -> 1L,
      ("last", "click") -> 1L, ("last", "view") -> 1L), s"got $m")
  }

  // ---------------------------------------------------------------- q250

  test("law: q250 ledger algebra — every diff lane is identically zero " +
    "and the forget mass is exactly the hash-selected users' rows") {
    def forgotten(u: Long): Boolean =
      graft.plans.Md5Prefix64.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"del|$u")
      ) % 16 == 0
    val users = 0L until 64L
    val nForget = users.count(forgotten)
    assert(nForget > 0, "fixture needs at least one forgotten user")
    val rows = users.map(u => ("click", u, 1.25))
    val got = EventQueries.deletionAuditCore(
      rows.toDF("event_type", "user_id", "value")).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((64L - nForget, 125L * (64 - nForget), 64L - nForget)), s"got $r")
    assert((r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)) ==
      ((0L, 0L, 0L, nForget.toLong)), s"got $r")
  }

  // ---------------------------------------------------------------- q251

  test("law: q251 a single-cell stream peaks there with ppm 1e6; " +
    "epoch day 2 (1970-01-03, a Saturday) lands dow 5 ⇒ weekend 1e6") {
    val rows = (1 to 5).map(i =>
      (Timestamp.from(java.time.Instant.ofEpochSecond(
        2L * 86400L + 5L * 3600L + i)), "click"))
    val got = EventQueries.seasonalityCore(
      rows.toDF("ts", "event_type")).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((5L, 5L, 1000000L, 1000000L)), s"got $r")
  }

  // ---------------------------------------------------------------- q252

  private def halfA(id: Long): Boolean =
    graft.plans.Md5Prefix64.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(s"cd|$id")
    ) % 2 == 0

  test("law: q252 identical halves drift 0; a planted constant offset " +
    "of 0.1 per dim drifts exactly dims·(1e6)² in milli² units") {
    val ids = 0L until 64L
    val (as, bs) = ids.partition(halfA)
    assert(as.size >= 2 && bs.size >= 2, s"fixture: ${as.size}/${bs.size}")
    // label 0: both halves at the same point -> drift 0
    val same = (as.take(2) ++ bs.take(2)).map(id =>
      (id, 0, Seq(0.3f, 0.3f, 0.3f, 0.3f)))
    // label 1: half A at 0.1, half B at 0.2 -> per-dim milli delta 1e6
    val off = as.drop(2).take(2).map(id =>
      (id, 1, Seq(0.1f, 0.1f, 0.1f, 0.1f))) ++
      bs.drop(2).take(2).map(id => (id, 1, Seq(0.2f, 0.2f, 0.2f, 0.2f)))
    val got = DedupQueries.centroidDriftCore(
      (same ++ off).toDF("vec_id", "label", "embedding")).collect()
    assert(got.length == 2)
    val m = got.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(m(0L) == ((2L, 2L, 0L, 4L)), s"got ${m(0L)}")
    assert(m(1L) == ((2L, 2L, 4L * 1000000L * 1000000L, 4L)),
      s"got ${m(1L)}")
  }

  // ---------------------------------------------------------------- q253

  test("law: q253 a 4-node path from its canonical has depths 0,1,2,3; " +
    "isolated nodes land at depth 0") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val uni = Seq(1L, 2L, 3L, 4L, 5L).toDF("vec_id")
    val got = DedupQueries.chainDepthCore(spark, e, uni).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 2L, 1L -> 1L, 2L -> 1L, 3L -> 1L), s"$got")
  }

  test("law: q253 depth caps at 8 — a 12-node chain buckets its three " +
    "deepest nodes at 9 (mirroring the oracle's recursion guard)") {
    val e = (1L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val uni = (1L to 12L).toDF("vec_id")
    val got = DedupQueries.chainDepthCore(spark, e, uni).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = (0L to 8L).map(d => d -> 1L).toMap + (9L -> 3L)
    assert(got == expect, s"$got")
  }

  // ---------------------------------------------------------------- q254

  test("law: q254 an all-unique source reads unseen = ttr = 1e6; an " +
    "all-repeats source reads unseen 0") {
    val rows = Seq(
      ("u", "a b c d e"), // 3 distinct shingles, all singletons
      ("r", "x x x x x")) // one shingle type, count 3
    val got = TextQueries.goodTuringCore(
      rows.toDF("source", "text")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got("u") == ((3L, 3L, 3L, 1000000L, 1000000L)), s"$got")
    assert(got("r") == ((3L, 1L, 0L, 0L, 333333L)), s"$got")
  }

  // ---------------------------------------------------------------- q255

  test("law: q255 every strategy rule is reachable — broadcast (small " +
    "side), salt (one hot key ≥ 1e6 pairs), shuffle_hash (mid), merge " +
    "(both sides big); out_rows is the EXACT join cardinality") {
    import org.apache.spark.sql.functions.{lit => l}
    val s2 = spark
    import s2.implicits._
    def side(jn: String, sd: String, n: Long, keys: Long) =
      spark.range(n).select(l(jn).as("jn"), l(sd).as("side"),
        (org.apache.spark.sql.functions.col("id") % keys).as("k"))
    val sides = side("a_small", "L", 50, 50)
      .union(side("a_small", "R", 500000, 500000))
      .union(side("b_hot", "L", 300000, 150)      // 2000 rows per key
        .union(side("b_hot", "R", 300000, 300)))  // 1000 per key -> 2e6
      .union(side("c_mid", "L", 200000, 200000)
        .union(side("c_mid", "R", 500000, 500000)))
      .union(side("d_big", "L", 300000, 300000)
        .union(side("d_big", "R", 500000, 500000)))
    val got = graft.queries.Relational.joinAdvisorCore(sides).collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getString(6))).toMap
    assert(got("a_small") == ((50L, "broadcast")), s"$got")
    // b_hot: 150 shared keys x 2000 x 1000 = 3e8 rows, 2e6 per key
    assert(got("b_hot") == ((300000000L, "salt")), s"$got")
    assert(got("c_mid") == ((200000L, "shuffle_hash")), s"$got")
    assert(got("d_big") == ((300000L, "merge")), s"$got")
  }

  // ---------------------------------------------------------------- q256

  test("law: q256 identical weeks drift 0; a +5.00 shift in one week " +
    "moves every quantile by exactly 500 cents, peaking there") {
    def wk(w: Long, s: Int) = Timestamp.from(
      java.time.Instant.ofEpochSecond(w * 604800L + s))
    // weeks 0..2 identical values {1..10}; week 3 shifted +5.00
    val rows = (for (w <- 0L to 2L; i <- 1 to 10)
      yield (wk(w, i), i.toDouble)) ++
      (1 to 10).map(i => (wk(3L, i), i.toDouble + 5.0))
    val got = EventQueries.quantileDriftCore(
      rows.toDF("ts", "value")).collect()
    assert(got.length == 3)
    got.foreach { r =>
      assert((r.getLong(1), r.getLong(2)) == ((500L, 3L)), s"got $r")
    }
  }

  // ---------------------------------------------------------------- q257

  test("law: q257 a 0/1-coordinate corpus is exactly representable at " +
    "4, 6 and 8 bits — quantized ranking equals truth, recall 1e6 at " +
    "every width") {
    def v(bits: Int*): Seq[Float] =
      Seq.tabulate(64)(i => if (bits.contains(i)) 1f else 0f)
    // probe overlaps corpus vectors by a strictly decreasing number of
    // set dims -> unambiguous ranking at every quantization
    val probe = (20L, v(0 until 16: _*), 0)
    val corpus = (0 until 12).map(i =>
      (i.toLong, v(0 until (16 - i): _*)))
    val ranges = (Seq.fill(64)(0.0), Seq.fill(64)(1.0))
    val got = DedupQueries.sqBitsSweepCore(spark,
      corpus.toDF("vec_id", "embedding"), Seq(probe), ranges).collect()
    assert(got.length == 3)
    got.foreach(r => assert(r.getLong(3) == 1000000L, s"got $r"))
  }

  // ---------------------------------------------------------------- q258

  test("law: q258 a planted zero vector counts in n_zero AND " +
    "n_degenerate; a half-scale vector crosses the quarter-mean rule " +
    "while healthy unit-ish vectors do not") {
    def v(x: Float) = Seq.fill(64)(x)
    // 8 healthy vectors at 0.125 (n2 = 64·1250² = 1e8), one zero, one
    // at 1/4 amplitude (0.03125·1e4 = 312.5 → HALF_UP 313; n2 =
    // 64·313² = 6_270_016 — 4·n2 ≈ 25.1e6 < gmean ≈ 80.6e6, crosses)
    val rows = (0 until 8).map(i => (i.toLong, 0, v(0.125f))) ++
      Seq((8L, 0, v(0f)), (9L, 0, v(0.03125f)))
    val got = DedupQueries.normHealthCore(
      rows.toDF("vec_id", "label", "embedding")).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(1), r.getLong(2), r.getLong(5), r.getLong(6)) ==
      ((10L, 0L, 1L, 2L)), s"got $r")
    // mean over 10 = (8·1e8 + 6_270_016) / 10, floored
    assert(r.getLong(4) == 80627001L, s"got $r")
  }

  // ------------------------------------------------- 2^40 key audit

  test("law: encoded rank keys are id-exact for ids ≥ 2^33 — a big-id " +
    "vector at the top-10 boundary ranks by its TRUE dot (under the " +
    "old 2^33 keys its id high bits leaked into the rq lane, demoting " +
    "it below the cut AND mangling its decoded id)") {
    val bigId = 2L * 8589934592L + 3L // id div 2^33 = 2 — the leak
    def v(a: Float, b: Float) = Seq(a, b, 0f, 0f)
    val cell0 = Seq( // x-dominant ⇒ assigned to centroid 0
      (1L, v(0.9f, 0f)), (2L, v(0.89f, 0f)), (3L, v(0.88f, 0f)),
      (4L, v(0.87f, 0f)), (5L, v(0.865f, 0f)), (bigId, v(0.8001f, 0f)))
    val cell1 = Seq( // y-dominant ⇒ assigned to centroid 1
      (6L, v(0.86f, 0.95f)), (7L, v(0.85f, 0.95f)),
      (8L, v(0.84f, 0.95f)), (9L, v(0.83f, 0.95f)),
      (10L, v(0.8f, 0.95f)), (11L, v(0.4f, 0.95f)))
    val e = (cell0 ++ cell1).toDF("vec_id", "embedding")
    val cents = Seq((0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f)))
    // probe ranks by x; nprobe=1 probes cell 0 only
    val probes = Seq((999L, Seq(1f, 0f, 0f, 0f), Seq(0L, 1L, 1L, 1L)))
    val got = DedupQueries.multiProbeCore(spark, e, cents, probes)
      .collect()
    assert(got.length == 3)
    // true top-10 by x: 9 vecs above 0.8001, then the big-id vec (in),
    // then id 10 at 0.8 (out at rank 11): cell-0 hits = 6 of 10
    val hits = got.map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(hits == Map(1L -> 6L, 2L -> 10L, 4L -> 10L), s"got $hits")
  }

  // ---------------------------------------------------------------- q247

  private def vec(at: Int, x: Float): Seq[Float] =
    Seq.tabulate(64)(i => if (i == at) x else 0f)

  test("law: q247 prefix-resident mass — all signal in dim 0: prefix " +
    "ranking equals full ranking, recall 1e6 at d=16 and d=32") {
    val corpus = (0 until 12).map(i =>
      (i.toLong, vec(0, 1f - i * 0.01f)))
    val probe = Seq((20L, vec(0, 1f)))
    val got = DedupQueries.matryoshkaRecallCore(
      (corpus ++ probe).toDF("vec_id", "embedding")).collect()
    assert(got.length == 2)
    got.foreach(r => assert(r.getLong(3) == 1000000L, s"got $r"))
  }

  test("law: q247 suffix-resident mass — all signal in dim 40 with 20 " +
    "corpus vectors: full top-10 = ids 10..19, prefix keys all tie to " +
    "vec_id order = ids 0..9 ⇒ recall 0 at both truncations") {
    val corpus = (0 until 20).map(i => (i.toLong, vec(40, i * 0.01f)))
    val probe = Seq((20L, vec(40, 1f)))
    val got = DedupQueries.matryoshkaRecallCore(
      (corpus ++ probe).toDF("vec_id", "embedding")).collect()
    assert(got.length == 2)
    got.foreach(r => assert(r.getLong(3) == 0L, s"got $r"))
  }

  // ------------------------------------- 2^44 packed-key audit (ADVICE)

  // Under the old 2^37 width, low = vec_id·16 + label overflows its lane
  // once vec_id ≥ 2^33 (~8.6e9 — below replica/100TB ids ~1e10): the
  // spill leaks into the rq lane, DEMOTING the vector near the cut and
  // mangling its decoded id. ids here are chosen so the leaked key loses
  // exactly one rank — the test fails under 2^37 and passes under 2^44.
  private val pkBigId = 2L * 8589934592L + 3L // low = id·16+l ≈ 2.75e11

  test("law: q216 packed rank keys are id-exact past 2^33 — a big-id " +
    "negative at the top-5 boundary keeps its true rank, id and rdot") {
    def v(x: Float) = Seq(x, 0f, 0f, 0f)
    val e = Seq(
      (1L, v(0.9f), 1), (2L, v(0.89f), 1), (3L, v(0.88f), 1),
      (4L, v(0.87f), 1), (pkBigId, v(0.86f), 1), (10L, v(0.8599f), 1))
      .toDF("vec_id", "embedding", "label")
    val probes = Seq((999L, Seq(1f, 0f, 0f, 0f), 0))
    val got = DedupQueries.hardNegCore(spark, e, probes).collect()
    assert(got.length == 5)
    val r5 = got.last // (qid, rk, vec_id, neg_label, rdot)
    assert((r5.getLong(1), r5.getLong(2), r5.getLong(3),
      r5.getDouble(4)) == ((5L, pkBigId, 1L, 0.86)), s"got $r5")
  }

  test("law: q224 packed rank keys are id-exact past 2^33 — the only " +
    "relevant vector, big-id at rank 10, still scores hits=1 and " +
    "ndcg = disc[10] (under 2^37 it fell out of the cut: hits 0)") {
    def v(x: Float) = Seq(x, 0f, 0f, 0f)
    val corpus = (1 to 9).map(i => (i.toLong, v((1f - i * 0.01f)), 1)) ++
      Seq((pkBigId, v(0.86f), 0), (20L, v(0.8599f), 1))
    val probes = Seq((999L, Seq(1f, 0f, 0f, 0f), 0))
    val got = DedupQueries.knnNdcgCore(spark,
      corpus.toDF("vec_id", "embedding", "label"), probes).collect()
    assert(got.length == 1)
    val r = got.head // (qid, hits, ndcg_ppm, mrr_ppm)
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((1L, 289064L, 100000L)), s"got $r")
  }
}
