package graft

import org.apache.spark.sql.Row

/** Semantic invariants for the event-analytics + PQ-ANN family
  * (q135-q138) beyond the DuckDB oracle gate: funnel monotonicity,
  * retention cohort containment, a from-scratch differential replica of
  * the rolling-anomaly integer algebra, and a brute-force differential
  * replica of the PQ code assignment + ADC scan.
  */
class AnalyticsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.all.find(_.name == name).get.fn(spark, sfDir)

  test("q135 funnel: stage counts are non-increasing and lags bounded") {
    val rows = q("q135_funnel").collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("view", "click", "purchase"))
    val counts = rows.map(_.getLong(2))
    assert(counts.sliding(2).forall(p => p(0) >= p(1)),
      s"funnel widened: ${counts.toSeq}")
    val lags = rows.map(_.getLong(3))
    assert(lags.head == 0L)
    assert(lags.forall(l => l >= 0L && l <= 7L * 86400), s"lags: ${lags.toSeq}")
  }

  test("q136 retention: every cell is contained in its cohort's base cell") {
    val cells = q("q136_retention").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val base = cells.collect { case ((c, 0L), n) => c -> n }
    assert(base.nonEmpty)
    cells.foreach { case ((c, off), n) =>
      assert(base.contains(c), s"cohort $c has no offset-0 cell")
      assert(n <= base(c), s"cell ($c,$off)=$n exceeds base ${base(c)}")
    }
    // offset-0 cells partition the user population
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(base.values.sum == users)
  }

  test("q137 rolling anomaly: matches a from-scratch replica") {
    val events = Tables.events(spark, sfDir)
      .selectExpr("event_id", "user_id", "cast(ts as double) AS tsec",
        "cast(floor(value * 100) as long) AS v")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val expected = events.groupBy(_._2).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._3, e._1))
      sorted.indices.collect {
        case i if i >= 20 && {
          val w = sorted.slice(i - 20, i).map(_._4)
          val s = w.sum; val sq = w.map(x => x * x).sum; val v = sorted(i)._4
          (20 * v - s) * (20 * v - s) > 9 * (20 * sq - s * s)
        } => sorted(i)._1
      }
    }.toSet
    val got = q("q137_rolling_anomaly").collect().map(_.getLong(0)).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
  }

  test("q138 PQ ANN: top-5 matches a brute-force ADC replica") {
    val vecs = Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def subdot(a: Array[Float], b: Array[Float], m: Int): Double = {
      var acc = 0.0; var i = m * 16
      while (i < m * 16 + 16) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val cents = (0L until 8L).map(c => c -> vecs(c)).toMap
    // codes: per (vec, m) argmax dot against the 8 codebook entries
    val codes = vecs.map { case (id, v) =>
      id -> (0 until 4).map { m =>
        cents.toSeq.map { case (c, cv) => (subdot(v, cv, m), -c) }.max._2 * -1
      }
    }
    val qids = Seq(20L, 21L, 22L)
    val expected = qids.flatMap { qid =>
      val qv = vecs(qid)
      val scored = codes.collect { case (id, cs) if id != qid =>
        val adc = (0 until 4)
          .map(m => subdot(qv, cents(cs(m)), m))
          .reduceLeft(_ + _)
        (id, adc)
      }.toSeq
      scored.sortBy { case (id, adc) => (-adc, id) }.take(5)
        .map { case (id, adc) =>
          (qid, id, math.round(adc * 10000.0) / 10000.0) }
    }.toSet
    val got = q("q138_pq_ann").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
  }

  test("q141 PPJoin: equals brute-force all-pairs Jaccard on sf0.001") {
    // from-scratch truth: trigram shingle sets (w=3 at this corpus size),
    // all C(n,2) pairs, exact integer test 3*|I| >= ma+mb
    val docs = Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "split(text, ' ') AS w").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
    val sets = docs.map { case (id, w) =>
      id -> w.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }.toMap
    val ids = sets.keys.toSeq.sorted
    val expected = (for {
      i <- ids.indices.iterator; j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      inter = (sets(a) & sets(b)).size
      if 3 * inter >= sets(a).size + sets(b).size
    } yield (a, b, inter.toLong,
      (sets(a).size + sets(b).size - inter).toLong)).toSet
    val got = q("q141_ppjoin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // the engine intersects HASHED shingles (md5_prefix64) — identical
    // pair membership unless a 32-bit collision lands inside one doc's
    // set; assert pair-set equality and size agreement
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
  }
}
