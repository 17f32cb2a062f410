package graft

import org.apache.spark.sql.functions._
import graft.queries.{DedupQueries, TextQueries}

/** Laws for the round-9 batch q200–q207: brute-force mirrors independent
  * of the DuckDB oracle, plus crafted-topology tests for the graph/pair
  * cores (chains, cycles, ambiguous boundaries, margin accept/reject)
  * that the gate SFs cannot reach.
  */
class Round9bLawsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("law: q200 crafted chains — a 3-chain reassembles, a 2-cycle is " +
    "flagged, an ambiguous boundary is excluded") {
    val docs = Seq(
      // chain A(10) -> B(11) -> C(12)
      10L -> "a1 a2 a3 k1 k2 k3",
      11L -> "k1 k2 k3 m1 m2 m3",
      12L -> "m1 m2 m3 z1 z2 z3",
      // cycle D(20) <-> E(21)
      20L -> "p1 p2 p3 q1 q2 q3",
      21L -> "q1 q2 q3 p1 p2 p3",
      // ambiguous: F(30) -> {G(31), H(32)} — outdeg 2, all excluded
      30L -> "f1 f2 f3 w1 w2 w3",
      31L -> "w1 w2 w3 g1 g2 g3",
      32L -> "w1 w2 w3 h1 h2 h3",
      // isolated
      40L -> "u1 u2 u3 u4 u5 u6")
    val df = docs.map { case (id, t) => (id, t, t.length.toLong) }
      .toDF("doc_id", "text", "n_chars")
    val got = DedupQueries.chainReassembly(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    val chars = docs.toMap.view.mapValues(_.length.toLong).toMap
    val expect = Seq(
      (2L, 1L, 2L, chars(20L) + chars(21L), 1L), // the D-E cycle
      (3L, 1L, 3L, chars(10L) + chars(11L) + chars(12L), 0L))
    assert(got == expect, s"got ${got.toList}")
  }

  test("law: q200 at the gate SF equals a driver-side union-find mirror") {
    val out = SparkEntry.queries("q200_chain_reassembly")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bounds = docs.flatMap { case (id, t, _) =>
      val ws = t.split(" ")
      if (ws.length < 6) None
      else Some((id, ws.take(3).mkString(" "), ws.takeRight(3).mkString(" ")))
    }
    val pairs = for {
      (pa, _, ta) <- bounds
      (pb, hb, _) <- bounds
      if pa != pb && ta == hb
    } yield (pa, pb)
    val outd = pairs.groupBy(_._1).view.mapValues(_.size).toMap
    val ind = pairs.groupBy(_._2).view.mapValues(_.size).toMap
    val links = pairs.filter(p => outd(p._1) == 1 && ind(p._2) == 1)
    // union-find
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    links.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = links.flatMap(l => Seq(l._1, l._2)).distinct
    val byChars = docs.map(d => d._1 -> d._3).toMap
    val comp = members.groupBy(find)
    val linksBy = links.groupBy(l => find(l._1))
    val expect = comp.toSeq.map { case (lbl, ms) =>
      (ms.size.toLong, ms.map(byChars).sum, linksBy(lbl).size.toLong)
    }.groupBy(_._1).toSeq.map { case (len, xs) =>
      (len, xs.size.toLong, xs.map(_._1).sum, xs.map(_._2).sum,
        xs.count(x => x._3 == x._1).toLong)
    }.sortBy(_._1)
    assert(out == expect, s"got ${out.toList} expected ${expect.toList}")
  }

  test("law: q201 margin rule on crafted pairs — accept by ratio, " +
    "reject under it, accept singletons, ignore same-lang") {
    val pairs = Seq(
      (1L, 2L, 0.9), (1L, 3L, 0.8), // 1->fr: 9000 vs 8000 -> accept
      (2L, 3L, 0.95),               // fr-fr: excluded
      (4L, 2L, 0.5), (4L, 3L, 0.49), // 4->fr: 5000 vs 4900 -> reject
      (1L, 5L, 0.3))                // 1->de singleton -> accept
      .toDF("id_a", "id_b", "rdot")
    val lg = Seq(1L -> "en", 2L -> "fr", 3L -> "fr", 4L -> "en",
      5L -> "de").toDF("doc_id", "lang")
    val got = DedupQueries.bitextFromPairs(pairs, lg).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // brute force (symmetrized, same-lang dropped, top-2 by (m desc, nbr))
    val langs = Map(1L -> "en", 2L -> "fr", 3L -> "fr", 4L -> "en",
      5L -> "de")
    val sym = pairs.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getDouble(2))).flatMap { case (a, b, d) =>
      Seq((a, b, d), (b, a, d)) }
    val expect = sym
      .map { case (s, n, d) => (s, langs(s), langs(n), n,
        math.round(d * 10000)) }
      .filter(x => x._2 != x._3)
      .groupBy(x => (x._1, x._3)).toSeq
      .map { case ((s, lt), xs) =>
        val sorted = xs.sortBy(x => (-x._5, x._4))
        val m1 = sorted.head._5
        val m2 = sorted.drop(1).headOption.map(_._5)
        (s, xs.head._2, lt, m1, m2)
      }
      .groupBy(x => (x._2, x._3)).toSeq.map { case ((lsrc, ltgt), xs) =>
        val acc = xs.filter(x => x._5.isEmpty || x._4 * 100 >= x._5.get * 105)
        (lsrc, ltgt, xs.size.toLong, acc.size.toLong, acc.map(_._4).sum)
      }.sortBy(x => (x._1, x._2))
    assert(got == expect, s"got ${got.toList} expected ${expect.toList}")
    // the crafted set must exercise both branches
    assert(expect.exists(x => x._4 < x._3), "no rejection exercised")
    assert(expect.exists(x => x._4 == x._3 && x._3 > 0), "no acceptance")
  }

  test("law: q205 equals brute force on crafted pairs (normalization, " +
    "distinct docs, sim mass)") {
    val pairs = Seq((1L, 2L, 0.5), (1L, 3L, 0.4), (2L, 3L, 0.6),
      (4L, 5L, 0.9)).toDF("id_a", "id_b", "rdot")
    val src = Seq(1L -> "sB", 2L -> "sA", 3L -> "sA", 4L -> "sC",
      5L -> "sC").toDF("doc_id", "source")
    val got = DedupQueries.overlapFromPairs(pairs, src).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    val s = Map(1L -> "sB", 2L -> "sA", 3L -> "sA", 4L -> "sC", 5L -> "sC")
    val sp = Seq((1L, 2L, 5000L), (1L, 3L, 4000L), (2L, 3L, 6000L),
      (4L, 5L, 9000L)).map { case (a, b, m) =>
      val (s1, s2) = (Seq(s(a), s(b)).min, Seq(s(a), s(b)).max)
      (s1, s2, a, b, m)
    }
    val expect = sp.groupBy(x => (x._1, x._2)).toSeq
      .map { case ((s1, s2), xs) =>
        (s1, s2, xs.size.toLong,
          xs.flatMap(x => Seq(x._3, x._4)).distinct.size.toLong,
          xs.map(_._5).sum)
      }.sortBy(x => (x._1, x._2))
    assert(got == expect, s"got ${got.toList} expected ${expect.toList}")
  }

  test("law: q202 equals brute-force rank-frequency octaves") {
    val out = SparkEntry.queries("q202_zipf_profile")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4))).toSeq
    val toks = Tables.documents(spark, sf).select("lang", "text").collect()
      .flatMap(r => r.getString(1).split(" ").map(r.getString(0) -> _))
    val expect = toks.groupBy(_._1).toSeq.flatMap { case (lang, xs) =>
      val byW = xs.groupBy(_._2).map { case (w, ys) => w -> ys.size.toLong }
      val ranked = byW.toSeq.sortBy { case (w, c) => (-c, w) }.zipWithIndex
        .map { case ((w, c), i) => (i + 1L, w, c) }
      val oct = ranked.filter(x => Seq(1L, 2, 4, 8, 16, 32, 64, 128, 256)
        .contains(x._1))
      oct.zip(None +: oct.map(x => Some(x._3))).map {
        case ((r, w, c), prev) =>
          val ratio = prev.map(p => (c / p) * 1000000L + c % p * 1000000L / p)
            .getOrElse(0L)
          (lang, r, w, c, ratio)
      }
    }.sortBy(x => (x._1, x._2))
    assert(out == expect, s"got ${out.take(5)} expected ${expect.take(5)}")
  }

  test("law: q203 conservation and exact integer sqrt — allocations sum " +
    "to B, weights are floor-sqrt, epochs match BigInt math") {
    val out = SparkEntry.queries("q203_mixture_weights")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    val b = out.map(_._3).sum / 2
    assert(out.map(_._5).sum == b,
      s"allocations sum to ${out.map(_._5).sum}, budget is $b")
    out.foreach { case (lang, source, toks, wt, alloc, ppm) =>
      val isq = java.math.BigInteger.valueOf(toks).sqrt().longValueExact()
      assert(wt == isq, s"$lang/$source: wt $wt != isqrt($toks) = $isq")
      val expectPpm = (BigInt(alloc) * 1000000 / BigInt(toks)).toLong
      assert(ppm == expectPpm, s"$lang/$source: ppm $ppm != $expectPpm")
    }
    // largest-remainder: every domain within 1 of the unrounded share
    val ww = out.map(_._4).sum
    out.foreach { case (lang, source, _, wt, alloc, _) =>
      val exact = BigInt(b) * BigInt(wt) / BigInt(ww)
      assert((BigInt(alloc) - exact).abs <= 1,
        s"$lang/$source: alloc $alloc vs exact share $exact")
    }
  }

  test("law: q204 equals a brute-force first-occurrence scan") {
    val out = SparkEntry.queries("q204_novelty_curve")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val md = docs.map(_._1).max
    val grams = docs.map { case (id, t) =>
      val ws = t.split(" ")
      id -> ws.sliding(5).filter(_.length == 5).map(_.mkString(" ")).toSet
    }.filter(_._2.nonEmpty)
    val firstDoc = grams.flatMap { case (id, gs) => gs.map(_ -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).min }
    val perDoc = grams.map { case (id, gs) =>
      (id, gs.size.toLong, gs.count(g => firstDoc(g) == id).toLong)
    }
    val expect = perDoc.groupBy(x => x._1 * 10 / (md + 1)).toSeq
      .map { case (dec, xs) =>
        val (g, n) = (xs.map(_._2).sum, xs.map(_._3).sum)
        (dec, xs.size.toLong, g, n, (n / g) * 1000000 + n % g * 1000000 / g)
      }.sortBy(_._1)
    assert(out == expect, s"got ${out.toList} expected ${expect.toList}")
    // non-vacuous: some grams repeat across docs at the gate SF
    assert(out.map(_._4).sum < out.map(_._3).sum,
      "every gram novel — duplicate mass missing, law vacuous")
  }

  test("law: q206 equals a brute-force exact-centroid distance ranking") {
    val out = SparkEntry.queries("q206_emb_outliers")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    val embs = Tables.embeddings(spark, sf)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong,
        r.getSeq[Float](2).toArray))
    val quant = embs.map { case (id, l, v) =>
      (id, l, v.map(x => math.round(x.toDouble * 10000)))
    }
    val expect = quant.groupBy(_._2).toSeq.flatMap { case (label, xs) =>
      val n = xs.length.toDouble
      val sums = Array.tabulate(64)(i => xs.map(_._3(i)).sum)
      val cp = sums.map(s => (s.toDouble / n) / 10000.0)
      val cc = cp.indices.foldLeft(0.0)((a, i) => a + cp(i) * cp(i))
      xs.map { case (id, _, v) =>
        val vp = v.map(_.toDouble / 10000.0)
        val vv = vp.indices.foldLeft(0.0)((a, i) => a + vp(i) * vp(i))
        val vc = vp.indices.foldLeft(0.0)((a, i) => a + vp(i) * cp(i))
        (label, id, vv - 2 * vc + cc)
      }.sortBy(x => (-x._3, x._2)).take(5).zipWithIndex.map {
        case ((l, id, d2), i) =>
          (l, i + 1L, id, BigDecimal(d2).setScale(4,
            BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }.sortBy(x => (x._1, x._2))
    assert(out == expect,
      s"got ${out.take(6)} expected ${expect.take(6)}")
  }

  test("law: q207 equals brute-force taxonomy flags and Jaccard") {
    val out = SparkEntry.queries("q207_taxonomy_cooccur")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    val cats = Map(
      "perf" -> Set("fast", "slow", "big", "small"),
      "exec" -> Set("scan", "join", "sort", "merge"),
      "data" -> Set("table", "column", "row", "vector"),
      "stream" -> Set("stream", "batch", "window", "queue"))
    val flags = Tables.documents(spark, sf).select("text").collect()
      .map { r =>
        val ws = r.getString(0).split(" ").toSet
        cats.view.mapValues(k => if (ws.intersect(k).nonEmpty) 1L else 0L)
          .toMap
      }
    val names = cats.keys.toSeq.sorted
    val expect = (for {
      a <- names; b <- names if a <= b
    } yield {
      val nBoth = flags.map(f => f(a) * f(b)).sum
      val na = flags.map(_(a)).sum
      val nb = flags.map(_(b)).sum
      val un = na + nb - nBoth
      (a, b, nBoth, if (un == 0) 0L else nBoth * 1000000 / un)
    }).sortBy(x => (x._1, x._2))
    assert(out == expect, s"got ${out.toList} expected ${expect.toList}")
  }
}
