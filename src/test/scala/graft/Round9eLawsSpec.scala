package graft

import org.apache.spark.sql.functions._
import graft.queries.DedupQueries

/** Laws for q216–q217: crafted topologies (a same-label near-twin that
  * MUST be excluded; a perfect codebook that must show zero distortion)
  * plus gate-SF brute-force mirrors.
  */
class Round9eLawsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def dotD(a: Seq[Float], b: Seq[Float]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }
  private def rq(a: Seq[Float], b: Seq[Float]): Long =
    BigDecimal(dotD(a, b) * 10000)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  // ---------------------------------------------------------------- q216

  test("law: q216 crafted — the identical same-label twin is excluded; " +
    "the best cross-label vector ranks first with its label and rdot") {
    val qv = Seq(1f, 0f, 0f, 0f)
    val rows = Seq(
      (10L, qv, 1), // the anchor itself
      (20L, qv, 1), // identical twin, SAME label -> must be excluded
      (21L, Seq(0.9f, 0f, 0f, 0f), 2), // best hard negative
      (22L, Seq(0.5f, 0f, 0f, 0f), 3),
      (23L, Seq(0.4f, 0f, 0f, 0f), 2),
      (24L, Seq(0.3f, 0f, 0f, 0f), 0),
      (25L, Seq(0.2f, 0f, 0f, 0f), 4),
      (26L, Seq(0.1f, 0f, 0f, 0f), 5))
    val got = DedupQueries.hardNegCore(spark,
      rows.toDF("vec_id", "embedding", "label"),
      Seq((10L, qv, 1))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got.map(_._3) == Seq(21L, 22L, 23L, 24L, 25L))
    assert(got.head == ((10L, 1L, 21L, 2L, 0.9)))
    assert(!got.map(_._3).contains(20L))
  }

  test("law: q216 at the gate SF equals a driver-side cross-label " +
    "top-5 mirror (ids, labels, ranks and rdots)") {
    val e = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2)))
    val probes = e.filter(p => p._1 >= 10 && p._1 < 18).sortBy(_._1)
    val expect = probes.flatMap { case (qid, qv, ql) =>
      e.filter(o => o._1 != qid && o._3 != ql)
        .map(o => (o._1, o._3, rq(qv, o._2)))
        .sortBy { case (id, _, r) => (-r, id) }.take(5)
        .zipWithIndex.map { case ((id, l, r), i) =>
          (qid, i + 1L, id, l.toLong, r.toDouble / 10000)
        }
    }.toSeq
    val got = SparkEntry.queries("q216_hard_negatives")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(got == expect)
  }

  test("law: q216 fails LOUDLY on a label outside [0,16) — a silent " +
    "pack would corrupt both the vec_id and neg_label decodes") {
    val qv = Seq(1f, 0f, 0f, 0f)
    val rows = Seq(
      (10L, qv, 1),
      (21L, Seq(0.9f, 0f, 0f, 0f), 16)) // 16 needs a 5th low bit
    val ex = intercept[Exception] {
      DedupQueries.hardNegCore(spark,
        rows.toDF("vec_id", "embedding", "label"),
        Seq((10L, qv, 1))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("label outside [0,16)")))
  }

  // ---------------------------------------------------------------- q217

  test("law: q217 perfect codebook — a corpus of exact centroid copies " +
    "has ADC == exact dot and zero inversions") {
    // 8 near-orthogonal 64-dim centroids; every corpus vector (incl.
    // the probes 20..22) is an exact copy of one centroid, so each
    // subspace code recovers the true centroid and ADC reconstructs
    // the exact dot.
    def cvec(c: Int): Seq[Float] =
      (0 until 64).map(i => if (i % 8 == c) 1f + c * 0.1f else 0f)
    val rows = (0L until 40L).map(i => (i, cvec((i % 8).toInt)))
    val got = DedupQueries.pqDistortionCore(
      rows.toDF("vec_id", "embedding"), Seq(20L, 21L, 22L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.length == 3)
    assert(got.forall { case (_, inv, np, ppm) =>
      inv == 0L && np == 120L && ppm == 0L }, s"got ${got.toSeq}")
  }

  test("law: q217 at the gate SF equals a driver-side subdot/code/ADC " +
    "mirror") {
    val e = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val cents = e.filter(_._1 < 8).sortBy(_._1).toSeq
    def subdot(a: Seq[Float], b: Seq[Float], m: Int): Double = {
      var acc = 0.0; var i = m * 16
      while (i < m * 16 + 16) {
        acc += a(i).toDouble * b(i).toDouble; i += 1
      }
      acc
    }
    val codes = e.map { case (id, v) =>
      id -> (0 until 4).map(m =>
        cents.map { case (cid, cv) => (cid, subdot(v, cv, m)) }
          .minBy { case (cid, dt) => (-dt, cid) }._1)
    }.toMap
    val expect = Seq(20L, 21L, 22L).map { qid =>
      val qv = e.find(_._1 == qid).get._2
      val lut = (0 until 4).map(m =>
        cents.map { case (cid, cv) => cid -> subdot(qv, cv, m) }.toMap)
      val adcq = e.filter(_._1 != qid).map { case (id, _) =>
        val c = codes(id)
        val adc = lut(0)(c(0)) + lut(1)(c(1)) + lut(2)(c(2)) + lut(3)(c(3))
        (id, BigDecimal(adc * 10000)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      }
      val top = adcq.sortBy { case (id, a) => (-a, id) }.take(16)
        .map { case (id, a) => (id, a, rq(qv, e.find(_._1 == id).get._2)) }
      val inv = (for {
        (a, i) <- top.zipWithIndex; b <- top.drop(i + 1)
        if a._1 != b._1
      } yield if ((a._2 > b._2 && a._3 < b._3) ||
          (a._2 < b._2 && a._3 > b._3)) 1L else 0L).sum
      val np = top.size.toLong * (top.size - 1) / 2
      (qid, inv, np, inv * 1000000L / np)
    }
    val got = SparkEntry.queries("q217_pq_distortion")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == expect)
  }
}
