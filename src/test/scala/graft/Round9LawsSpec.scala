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
}
