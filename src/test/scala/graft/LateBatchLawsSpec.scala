package graft

import org.apache.spark.sql.functions._
import graft.queries.{DedupQueries, PipelineQueries}

/** Dedicated laws for the round-8 late batch q185–q188 (round-9 verdict
  * item 1): each query gets an algebraic invariant checked independently
  * of the DuckDB oracle, including paths the gate SFs cannot reach (the
  * q185 hash-collision correction branch).
  */
class LateBatchLawsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("law: q185 8-word segments PARTITION the token stream — counts " +
    "and characters are conserved per doc") {
    val textGen = Seq(
      "one two three four five six seven eight nine",
      "a b c d e f g h",            // exactly one segment
      "single",                     // < 8 words
      "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16 w17")
    val df = textGen.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = df.select(col("doc_id"), col("text"),
        DedupQueries.segments8.as("segs"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getSeq[String](2)))
    got.foreach { case (_, text, segs) =>
      val words = text.split(" ").toSeq
      val expect = words.grouped(8).map(_.mkString(" ")).toSeq
      assert(segs == expect, s"segmentation mismatch for '$text'")
      // partition law: every word appears exactly once, in order
      assert(segs.flatMap(_.split(" ")).toSeq == words)
      // character conservation: inter-segment join spaces are the only
      // characters dropped
      assert(segs.map(_.length).sum == text.length - (segs.size - 1))
    }
  }

  test("law: q185 frequency semantics are CONTENT-exact even under " +
    "forced hash collisions (correction branch)") {
    // 8 docs; seg text chosen so a deliberately narrow hash (md5_prefix60
    // % 4) collides different contents into one key. Brute-force reference
    // = distinct-doc count per exact segment string.
    val docs = Seq(
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "alpha beta gamma delta epsilon zeta eta theta", // dup of 1
      3L -> "iota kappa lambda mu nu xi omicron pi",
      4L -> "rho sigma tau upsilon phi chi psi omega",
      5L -> "iota kappa lambda mu nu xi omicron pi tail words here now",
      6L -> "unique uno dos tres cuatro cinco seis siete",
      7L -> "tail words here now",                           // dup of 5's 2nd seg
      8L -> "solo")
    val df = docs.toDF("doc_id", "text")
    // narrow primary hash => massive cross-content collisions; second
    // hash stays wide so every mix is detected and corrected exactly
    val narrow = (c: org.apache.spark.sql.Column) =>
      pmod(call_function("md5_prefix60", c), lit(4L))
    val wide = (c: org.apache.spark.sql.Column) =>
      call_function("md5_prefix60", concat(c, lit("#2")))
    val got = DedupQueries.boilerplateRm(df, narrow, wide)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    // brute force: per doc, per segment, content-exact distinct-doc count
    val segsByDoc = docs.map { case (id, t) =>
      id -> t.split(" ").grouped(8).map(_.mkString(" ")).toSeq }
    val docsPerSeg = segsByDoc
      .flatMap { case (id, segs) => segs.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (seg, xs) => seg -> xs.map(_._2).size }
    val expect = segsByDoc.map { case (id, segs) =>
      val removed = segs.count(sg => docsPerSeg(sg) >= 2)
      val kept = segs.filter(sg => docsPerSeg(sg) < 2).map(_.length).sum
      (id, segs.size.toLong, removed.toLong, kept.toLong)
    }
    assert(got.sortBy(_._1) == expect.sortBy(_._1),
      s"got ${got.toList} expected ${expect.toList}")
    // sanity: the narrow hash really did collide different contents
    // (otherwise this test exercises nothing)
    val hv = df.select(explode(DedupQueries.segments8).as("seg"))
      .select(narrow(col("seg")).as("hv"), col("seg"))
      .distinct().groupBy("hv").count().collect()
    assert(hv.exists(_.getLong(1) >= 2), "no collisions forced; law vacuous")
  }

  test("law: q186 output is invariant under the shard width (forced " +
    "widths 1, 7, 256, 10^9)") {
    val t = Tables.documents(spark, sf).select(col("doc_id"), col("lang"),
      (expr("n_chars div 4") + lit(1L)).as("toks"))
    val outs = Seq(1L, 7L, 256L, 1000000000L).map { w =>
      PipelineQueries.seqPack(t, w).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSeq
    }
    outs.tail.foreach(o => assert(o == outs.head,
      "seq-pack output depends on the physical shard width"))
    // and the single-shard case (width 10^9) equals a plain global
    // running sum computed driver-side
    val rows = t.orderBy("doc_id").collect()
      .map(r => (r.getString(1), r.getLong(2)))
    var cum = 0L
    val bins = rows.map { case (lang, toks) =>
      cum += toks; (lang, toks, (cum - toks) / 512, (cum - 1) / 512) }
    val expect = bins.groupBy(_._1).map { case (lang, xs) =>
      (lang, xs.length.toLong, xs.map(_._2).sum,
        xs.count(x => x._4 > x._3).toLong,
        xs.map(x => x._4 - x._3 + 1).max, xs.map(_._4).max)
    }.toSeq.sortBy(_._1)
    assert(outs.head.sortBy(_._1) == expect)
  }

  test("law: q187 conservation — class sums reproduce corpus totals and " +
    "risky classes bound suppressed docs") {
    val out = SparkEntry.queries("q187_k_anonymity")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val docs = Tables.documents(spark, sf)
    val totalDocs = docs.count()
    assert(out.map(_._6).sum == totalDocs,  // sum(n_docs) over langs
      "class-sum conservation broken: docs lost or duplicated")
    val langDocs = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { case (lang, nCls, risky, suppressed, minK, nDocs) =>
      assert(nDocs == langDocs(lang))
      assert(risky <= nCls)
      assert(suppressed <= nDocs)
      // every risky class has 1..4 members; suppressed counts exactly them
      assert(suppressed >= risky && suppressed <= 4 * risky)
      assert(minK >= 1)
    }
  }

  test("law: q188 bottom-k tail — equals brute-force rarest-k sum per doc") {
    val out = SparkEntry.queries("q188_minkprob_audit")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // brute force on the collected corpus (sf0.001: 50 docs)
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val corpus = toks.values.flatten.groupBy(identity)
      .map { case (w, xs) => w -> xs.size.toLong }
    out.foreach { case (docId, nTok, kTail, tailSum, q) =>
      val ws = toks(docId)
      assert(nTok == ws.size.toLong)
      assert(kTail == nTok / 5 + 1)
      val sorted = ws.map(w => (corpus(w), w)).sorted
      val expectTail = sorted.take(kTail.toInt).map(_._1).sum
      assert(tailSum == expectTail, s"doc $docId tail mismatch")
      assert(q == tailSum / kTail)
      // rank law: the tail is the k MINIMUM counts — any excluded token's
      // count is >= every included one
      if (ws.size > kTail) {
        val inc = sorted.take(kTail.toInt).map(_._1).max
        val exc = sorted.drop(kTail.toInt).map(_._1).min
        assert(exc >= inc)
      }
    }
  }
}
