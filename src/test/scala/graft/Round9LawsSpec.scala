package graft

import org.apache.spark.sql.functions._

/** Laws for the round-9 additions q190–q194: each gets an invariant or a
  * brute-force mirror checked independently of the DuckDB oracle.
  */
class Round9LawsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("law: q190 split conservation — train+test = all itemed events; " +
    "leaked items bounded by both sides") {
    val out = SparkEntry.queries("q190_temporal_split")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val totals = Tables.events(spark, sf)
      .filter(get_json_object(col("props"), "$.k").isNotNull)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.map(_._1).toSet == totals.keySet)
    out.foreach { case (t, tr, te, tri, tei, leak, leakEv) =>
      assert(tr + te == totals(t), s"$t: events lost by the split")
      assert(leak <= math.min(tri, tei))
      assert(leakEv <= te)
      assert(leakEv >= leak) // every leaked item has >= 1 test event
    }
  }

  test("law: q191 equals a brute-force stupid-backoff bigram LM") {
    val out = SparkEntry.queries("q191_bigram_lm")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq)
    val uni = docs.flatMap(_._2).groupBy(identity)
      .map { case (w, xs) => w -> xs.size.toLong }
    val bgAll = docs.flatMap { case (_, ws) =>
      ws.sliding(2).filter(_.size == 2).map(_.mkString(" ")) }
    val cnt = bgAll.groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
    val expect = docs.filter(_._2.size >= 2).map { case (id, ws) =>
      val scores = ws.sliding(2).filter(_.size == 2).map { p =>
        val b = p.mkString(" ")
        if (cnt(b) >= 2) cnt(b) * 1000L else uni(p.head)
      }.toSeq
      (id, scores.size.toLong, scores.sum, scores.sum / scores.size)
    }
    assert(out.sortBy(_._1).toSeq == expect.sortBy(_._1).toSeq)
  }

  test("law: q192 diversity bounds — exposed docs only from low-l " +
    "classes, class counts conserve docs") {
    val out = SparkEntry.queries("q192_l_diversity")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // brute force on the collected table
    val docs = Tables.documents(spark, sf)
      .select("lang", "source", "n_chars").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val byLang = docs.groupBy(_._1)
    out.foreach { case (lang, nCls, minL, lowL, exposed) =>
      val classes = byLang(lang).groupBy(_._3 / 25)
      assert(nCls == classes.size.toLong)
      val ls = classes.values.map(_.map(_._2).distinct.size.toLong)
      assert(minL == ls.min)
      assert(lowL == ls.count(_ < 3).toLong)
      assert(exposed == classes.values
        .filter(_.map(_._2).distinct.size < 3).map(_.size.toLong).sum)
    }
    // the flag must actually fire at the gate SF, else the audit is vacuous
    assert(out.map(_._4).sum > 0, "no low-diversity class at sf0.001")
  }

  test("law: q193 char split is an exact partition on multibyte text") {
    // the 40/60 split must cut on CHARACTERS, not bytes — multibyte
    // text is where a byte-based substr would break the round trip
    val crafted = Seq("ünïcødé tëxt日本語の文字テスト",
      "ab", "a", "", "æøå ÆØÅ βγδ 中文字符串测试内容更长一些")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = crafted.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"),
        length(col("text")).cast("long").as("n"))
      .select(col("doc_id"), col("text"),
        col("text").substr(lit(1), expr("n * 2 div 5").cast("int")).as("pre"),
        col("text").substr((expr("n * 2 div 5") + 1L).cast("int"),
          expr("n * 3 div 5 - n * 2 div 5").cast("int")).as("mid"),
        col("text").substr((expr("n * 3 div 5") + 1L).cast("int"),
          expr("n - n * 3 div 5").cast("int")).as("suf"))
      .collect()
    df.foreach { r =>
      val (text, pre, mid, suf) =
        (r.getString(1), r.getString(2), r.getString(3), r.getString(4))
      assert(pre + mid + suf == text, s"round trip broken for '$text'")
      val n = text.length
      assert(pre.length == n * 2 / 5)
      assert(mid.length == n * 3 / 5 - n * 2 / 5)
    }
    // and the gate output proves it corpus-wide
    val out = SparkEntry.queries("q193_fim_split")(spark, sf).collect()
    out.foreach(r => assert(r.getLong(1) == r.getLong(6),
      s"lang ${r.getString(0)}: round trip failed for some doc"))
  }

  test("law: q194 equals brute-force chosen/rejected per user") {
    val out = SparkEntry.queries("q194_preference_pairs")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val w = Map("purchase" -> 3L, "signup" -> 2L, "click" -> 1L,
      "view" -> 0L).withDefaultValue(-2L)
    val ev = Tables.events(spark, sf)
      .filter(get_json_object(col("props"), "$.k").isNotNull)
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val pairs = ev.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val eng = xs.groupBy(_._2).map { case (it, es) =>
        it -> es.map(e => w(e._3)).sum }.toSeq
      if (eng.size < 2) None else {
        val chosen = eng.minBy { case (it, e) => (-e, it) }
        val rejected = eng.minBy { case (it, e) => (e, -it) }
        if (chosen._2 > rejected._2)
          Some((chosen._1, rejected._1, chosen._2 - rejected._2))
        else None
      }
    }
    val expect = pairs.groupBy(p => (p._1, p._2)).map { case ((c, rj), xs) =>
      (c, rj, xs.size.toLong, xs.map(_._3).sum)
    }.toSeq.sortBy(p => (-p._3, p._1, p._2)).take(50)
    assert(out.toSeq.sortBy(p => (-p._3, p._1, p._2)) == expect)
  }

  test("law: q195 equals a brute-force integer-exact TVD audit, and the " +
    "two-step floor division equals the BigInt single division") {
    val out = SparkEntry.queries("q195_t_closeness")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val docs = Tables.documents(spark, sf)
      .select("lang", "n_chars", "source").collect()
      .map(r => (r.getString(0), r.getLong(1) / 25, r.getString(2)))
    val nn = BigInt(docs.length)
    val gBySrc = docs.groupBy(_._3).map { case (s, xs) =>
      s -> BigInt(xs.length) }
    val expect = docs.groupBy(_._1).map { case (lang, xs) =>
      val classes = xs.groupBy(_._2)
      val per = classes.values.map { cs =>
        val nC = BigInt(cs.length)
        val d = gBySrc.map { case (src, gS) =>
          (BigInt(cs.count(_._3 == src)) * nn - gS * nC).abs }.sum
        // single BigInt division == the query's two-step 64-bit form
        val ppm = d * 1000000 / (2 * nn * nC)
        (ppm, if (d > nn * nC) 1L else 0L,
          if (d > nn * nC) nC.toLong else 0L)
      }
      (lang, classes.size.toLong, per.map(_._1.toLong).max,
        per.map(_._2).sum, per.map(_._3).sum)
    }.toSeq.sortBy(_._1)
    assert(out.toSeq.sortBy(_._1) == expect,
      s"got ${out.toList} expected ${expect.toList}")
    // a violation must exist at the gate SF or the audit is vacuous
    assert(out.map(_._4).sum > 0, "no t-violation at sf0.001")
  }

  test("law: q196 collision accounting is exact under a forced-narrow " +
    "pseudonym hash (unreachable with real 60-bit keys)") {
    // users 0..39 over two event types with known per-user counts; a
    // mod-7 hash guarantees cross-user collisions
    val rows = (0L until 40L).flatMap { u =>
      Seq.fill((u % 3).toInt + 1)(("click", u)) ++
        (if (u % 2 == 0) Seq.fill(2)(("purchase", u)) else Nil)
    }
    val df = rows.toDF("event_type", "user_id")
    val narrow = (c: org.apache.spark.sql.Column) =>
      pmod(call_function("md5_prefix60", c), lit(7L))
    val got = graft.queries.EventQueries.pseudonymizeAudit(df, narrow)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    // brute force with the same narrow hash, driver-side
    val hv = df.select(col("user_id").cast("string").as("s"))
      .distinct()
      .select(col("s"), narrow(col("s")).as("h")).collect()
      .map(r => r.getString(0).toLong -> r.getLong(1)).toMap
    val expect = rows.groupBy(_._1).map { case (et, xs) =>
      val byUser = xs.groupBy(_._2).map { case (u, es) => u -> es.size.toLong }
      val byPseudo = byUser.groupBy { case (u, _) => hv(u) }
        .map { case (_, us) => us.values.sum }
      (et, byUser.values.sum, byUser.size.toLong, byPseudo.size.toLong,
        byUser.size.toLong - byPseudo.size.toLong, byUser.values.max,
        byPseudo.max)
    }.toSeq.sortBy(_._1)
    assert(got.toSeq.sortBy(_._1) == expect,
      s"got ${got.toList} expected ${expect.toList}")
    // the forced hash must actually collide, else the law is vacuous,
    // and a collision must inflate the busiest pseudonym's multiset
    assert(got.map(_._5).sum > 0, "no collision forced; law vacuous")
    assert(got.exists(g => g._7 > g._6),
      "collisions never merged multisets; law vacuous")
    // and with the real hash on the same data: zero collisions, multiset
    // preserved exactly
    val real = graft.queries.EventQueries.pseudonymizeAudit(df,
      c => call_function("md5_prefix60", concat(lit("u"), c)))
      .collect().map(r => (r.getLong(4), r.getLong(5), r.getLong(6)))
    real.foreach { case (coll, mu, mp) =>
      assert(coll == 0L); assert(mu == mp)
    }
  }

  test("law: q197 content verify — under a CONSTANT boundary hash (every " +
    "boundary collides) only verbatim tail3==head3 pairs survive") {
    val docsSeq = Seq(
      1L -> "p1 p2 p3 alpha beta gamma",      // tail3 = "alpha beta gamma"
      2L -> "alpha beta gamma s1 s2 s3",      // head3 matches doc 1 tail3
      3L -> "alpha beta gamma s4 s5 s6",      // second successor
      4L -> "q1 q2 q3 delta epsilon zeta",    // tail3 matches nothing
      5L -> "delta epsilon zet s7 s8 s9",     // near-miss (zet != zeta)
      6L -> "too short here",                 // < 6 tokens: excluded
      7L -> "x1 x2 x3 x4 alpha beta gamma")   // longer doc, same tail3
    val df = docsSeq.toDF("doc_id", "text")
    val got = graft.queries.DedupQueries
      .boundaryOverlap(df, _ => lit(0L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got == Seq((1L, 2L), (1L, 3L), (7L, 2L), (7L, 3L)),
      s"got ${got.toList}")
    // and the real hash produces the identical pair set
    val real = graft.queries.DedupQueries
      .boundaryOverlap(df, c => call_function("md5_prefix60", c))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(real == got)
  }

  test("law: q197 256-cap bounds each side of a mega-boundary (pair " +
    "factory defense)") {
    // 300 predecessors all ending "a b c", 300 successors all starting
    // "a b c" -> uncapped output would be 90000 pairs; cap -> 256^2
    val preds = (1000L until 1300L).map(i => i -> s"p$i x y a b c")
    val succs = (2000L until 2300L).map(i => i -> s"a b c u v w$i")
    val df = (preds ++ succs).toDF("doc_id", "text")
    val n = graft.queries.DedupQueries
      .boundaryOverlap(df, c => call_function("md5_prefix60", c))
      .count()
    assert(n == 256L * 256L, s"cap not enforced: $n pairs")
  }

  test("law: q198 equals brute force; bucketing never wastes more than " +
    "global padding") {
    val out = SparkEntry.queries("q198_padding_waste")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val toks = Tables.documents(spark, sf).select("n_chars").collect()
      .map(r => r.getLong(0) / 4 + 1)
    val gm = toks.max
    val expect = toks.groupBy(_ / 32).map { case (b, xs) =>
      (b, xs.length.toLong, xs.sum, xs.max,
        xs.max * xs.length - xs.sum, gm * xs.length - xs.sum)
    }.toSeq.sortBy(_._1)
    assert(out.toSeq.sortBy(_._1) == expect)
    assert(out.map(_._2).sum == toks.length.toLong, "docs lost")
    out.foreach { case (_, _, _, _, wb, wg) =>
      assert(wb >= 0 && wg >= wb,
        "bucketed padding must be a win over global padding")
    }
  }

  test("law: q199 equals a brute-force per-user chat lint") {
    val out = SparkEntry.queries("q199_chat_lint")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("tsu"),
        col("event_id"),
        when(col("event_type").isin("click", "view"), 0L).otherwise(1L)
          .as("role")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val perUser = ev.groupBy(_._1).map { case (u, xs) =>
      val seq = xs.sortBy(x => (x._2, x._3)).map(_._4)
      val viol = seq.sliding(2).count(p => p.size == 2 && p(0) == p(1))
      val badStart = if (seq.head != 0L) 1L else 0L
      (u, seq.size.toLong, viol.toLong, badStart)
    }
    val expect = perUser.groupBy(x => x._3 * 10 / x._2)
      .map { case (dec, xs) =>
        (dec, xs.size.toLong, xs.map(_._2).sum, xs.map(_._3).sum,
          xs.map(_._4).sum)
      }.toSeq.sortBy(_._1)
    assert(out.toSeq.sortBy(_._1) == expect,
      s"got ${out.toList} expected ${expect.toList}")
    // deciles are structurally bounded: first turn has no predecessor
    out.foreach { case (dec, _, _, _, _) => assert(dec >= 0 && dec <= 9) }
  }
}
