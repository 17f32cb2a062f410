package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-11 ingestion/serving operators: hashed-linear classifier
  * inference (q158), incremental shard dedup (q159), corpus novelty
  * (q160), next-item training pairs (q161). Value-level cross-engine
  * checks are the DuckDB oracle gate; these pin the semantic invariants
  * the gate can't see (order invariance, exact-dup guarantees, sequence
  * coherence).
  */
class IngestOpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.queries(name)(spark, sfDir)

  // --- q158 classifier -------------------------------------------------

  test("q158: score is token-order invariant (bag-of-words model)") {
    val w998 = (call_function("md5_prefix64", col("w")) % 4096L) *
      2654435761L % 1997L
    def score(text: org.apache.spark.sql.Column) =
      Tables.documents(spark, sfDir)
        .select(col("doc_id"), explode(split(text, " ")).as("w"))
        .select(col("doc_id"), w998.as("w998"))
        .groupBy("doc_id").agg(sum("w998").as("s"))
    val fwd = score(col("text"))
    val rev = score(concat_ws(" ", reverse(split(col("text"), " "))))
    assert(fwd.join(rev.withColumnRenamed("s", "s2"), "doc_id")
      .filter(col("s") =!= col("s2")).count() == 0)
  }

  test("q158: keep is exactly score > 0 and n_tok matches token count") {
    val r = q("q158_classifier")
    assert(r.filter((col("score") > 0).cast("long") =!= col("keep"))
      .count() == 0)
    val n = Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long")
        .as("n"))
    assert(r.join(n, "doc_id").filter(col("n_tok") =!= col("n"))
      .count() == 0)
  }

  // --- q159 incremental dedup -----------------------------------------

  test("q159: differential vs brute-force signature comparison") {
    // with the 256 cap disengaged (observed q159_cap = 0 at this sf), an
    // incoming doc is flagged iff some corpus doc agrees on >= 2 of 4
    // minhashes: agreement >= 2 implies a shared band (the candidate
    // gate) and is the verify threshold itself. Recompute that set by
    // brute force over all incoming x corpus signature pairs.
    import graft.functions.TextOps
    val sig = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(TextOps.shingles(TextOps.tokens(col("text")), 3)).as("sh"))
      .select(col("doc_id"),
        call_function("md5_prefix64", col("sh")).as("h"))
      .groupBy("doc_id")
      .agg(min((col("h") * 1000003L + 12345L) % 4294967291L).as("k0"),
        min((col("h") * 2000029L + 54321L) % 4294967291L).as("k1"),
        min((col("h") * 3000073L + 98765L) % 4294967291L).as("k2"),
        min((col("h") * 4000037L + 13579L) % 4294967291L).as("k3"))
      .withColumn("incoming",
        call_function("md5_prefix64", col("doc_id").cast("string"))
          % 8L === 0L)
    val inc = sig.filter(col("incoming"))
    val cor = sig.filter(!col("incoming"))
      .select(col("doc_id").as("c_doc"), col("k0").as("c0"),
        col("k1").as("c1"), col("k2").as("c2"), col("k3").as("c3"))
    val agree = (col("k0") === col("c0")).cast("int") +
      (col("k1") === col("c1")).cast("int") +
      (col("k2") === col("c2")).cast("int") +
      (col("k3") === col("c3")).cast("int")
    val expect = inc.crossJoin(cor).filter(agree >= 2)
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("e_matches"),
        min("c_doc").cast("long").as("e_best"))
    val got = q("q159_incremental_dedup")
    assert(got.filter(col("is_dup") === 1).count() > 0) // path exercised
    val joined = got.join(expect, Seq("doc_id"), "left")
    assert(joined.filter(
      col("is_dup") =!= col("e_matches").isNotNull.cast("long") ||
        coalesce(col("n_matches"), lit(0L)) =!=
          coalesce(col("e_matches"), lit(0L)) ||
        !(col("best_match") <=> col("e_best"))).count() == 0)
  }

  test("q159: best_match is a corpus-side doc, never self or incoming") {
    val r = q("q159_incremental_dedup").filter(col("is_dup") === 1)
    val bad = r.filter(
      call_function("md5_prefix64", col("best_match").cast("string"))
        % 8L === 0L || col("best_match") === col("doc_id"))
    assert(bad.count() == 0)
    // non-dups carry no match info
    assert(q("q159_incremental_dedup").filter(col("is_dup") === 0)
      .filter(col("n_matches") =!= 0 || col("best_match").isNotNull)
      .count() == 0)
  }

  // --- q160 novelty ----------------------------------------------------

  test("q160: novelty_ppm bounded on the corpus") {
    val r = q("q160_novelty")
    assert(r.count() > 0)
    assert(r.filter(col("novelty_ppm") < 0 || col("novelty_ppm") > 1000000)
      .count() == 0)
  }

  test("q160: hand-computed novelty on a constructed corpus") {
    import spark.implicits._
    import graft.functions.TextOps
    // doc 1 == doc 2 (exact dup -> novelty 0); doc 3 shares exactly one
    // of its four shingles ("a b c") -> 750000; doc 4 all-novel -> 1e6
    val docs = Seq(
      (1L, "a b c d e"), (2L, "a b c d e"),
      (3L, "a b c x y z"), (4L, "p q r s"))
      .toDF("doc_id", "text")
    val dh = docs.select(col("doc_id"),
      explode(TextOps.shingles(TextOps.tokens(col("text")), 3)).as("sh"))
      .select(col("doc_id"),
        call_function("md5_prefix64", col("sh")).as("h"))
      .distinct()
    val occ = dh.groupBy("h").agg(count(lit(1)).as("nd"))
    val got = dh.join(occ, Seq("h"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_shingles"),
        sum((col("nd") === 1).cast("long")).cast("long").as("n_novel"))
      .select(col("doc_id"),
        expr("1000000 * n_novel div n_shingles").as("ppm"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 750000L, 4L -> 1000000L))
  }

  // --- q161 next-item pairs -------------------------------------------

  test("q161: contexts shift coherently along each user's sequence") {
    val r = q("q161_next_item_pairs")
    val w = Window.partitionBy("user_id").orderBy("event_id")
    // consecutive output rows are consecutive sequence positions, so the
    // context window slides by one: c2 = prev c1, c3 = prev c2, and the
    // previous target is the current c1
    val shifted = r.select(col("user_id"), col("event_id"),
      col("c1"), col("c2"), col("c3"),
      lag("c1", 1).over(w).as("p1"),
      lag("c2", 1).over(w).as("p2"),
      lag("target", 1).over(w).as("pt"))
      .filter(col("p1").isNotNull)
    assert(shifted.filter(col("c2") =!= col("p1") ||
      col("c1") =!= col("pt")).count() == 0)
    assert(shifted.filter(col("p2").isNotNull)
      .filter(col("c3") =!= col("p2")).count() == 0)
    assert(r.filter(col("c1").isNull).count() == 0)
  }

  // --- q162 boilerplate ------------------------------------------------

  test("q162: stripping is a fixpoint and clean never exceeds html") {
    val r = q("q162_boilerplate")
    assert(r.filter(col("n_clean") > col("n_html")).count() == 0)
    assert(r.filter(col("text_ratio_ppm") < 0 ||
      col("text_ratio_ppm") > 1000000).count() == 0)
    // rebuild the cleaned text and assert no tag characters survive
    val html = concat(
      lit("<html><head><title>doc"), col("doc_id").cast("string"),
      lit("</title><script>var x=1;</script></head><body><p>"),
      when(col("doc_id") % 3 === 0,
        regexp_replace(col("text"), lit(" "), lit("</p><p>")))
        .otherwise(col("text")),
      lit("</p><div class=\"footer\">&copy; example</div></body></html>"))
    val clean = trim(regexp_replace(regexp_replace(regexp_replace(
      html, lit("<script[^<]*</script>"), lit(" ")),
      lit("<[^>]*>"), lit(" ")),
      lit(" +"), lit(" ")))
    val leftover = Tables.documents(spark, sfDir)
      .select(clean.as("clean"))
      .filter(col("clean").contains("<") || col("clean").contains(">"))
    assert(leftover.count() == 0)
  }

  // --- q163 k-center coreset ------------------------------------------

  test("q163: selections distinct, radii non-increasing (greedy law)") {
    val rows = q("q163_kcenter_coreset").orderBy("round").collect()
    assert(rows.length == 6)
    val ids = rows.map(_.getLong(1))
    assert(ids.distinct.length == ids.length && !ids.contains(0L))
    val radii = rows.map(_.getLong(2))
    assert(radii.zip(radii.tail).forall { case (a, b) => b <= a },
      s"radii must be non-increasing: ${radii.mkString(",")}")
    assert(radii.last > 0)
  }

  // --- q164 domain cap -------------------------------------------------

  test("q164: at most 3 per domain and kept docs dominate their domain") {
    val r = q("q164_domain_cap")
    assert(r.groupBy("domain").count().filter(col("count") > 3)
      .count() == 0)
    assert(r.filter(col("rk") < 1 || col("rk") > 3).count() == 0)
    // every kept doc is at least as long as every dropped doc of its
    // domain (ties broken by doc_id, so compare against the 4th-ranked)
    val all = Tables.documents(spark, sfDir)
      .select(col("doc_id").as("d2"), col("n_chars").as("nc2"),
        concat(col("source"), lit("-"),
          (col("doc_id") % 5).cast("string"), lit(".example.com"))
          .as("domain"))
    val minKept = r.groupBy("domain")
      .agg(min("n_chars").as("min_kept"), count(lit(1)).as("nk"))
    val dropped = all.join(r.select(col("doc_id").as("d2")),
      Seq("d2"), "left_anti")
    val viol = dropped.join(minKept, "domain")
      .filter(col("nk") === 3 && col("nc2") > col("min_kept"))
    assert(viol.count() == 0)
  }

  // --- q165 decayed engagement ----------------------------------------

  test("q165: decayed weight bounded by the undecayed Q20 engagement") {
    val r = q("q165_decayed_engagement")
    assert(r.count() == 50)
    // each event contributes at most base * 2^20 (age 0) and at least
    // base * 1 (age clamp 20); purchase base is the max (5)
    assert(r.filter(col("decayed_q20") > col("n_events") * 5L * 1048576L)
      .count() == 0)
    assert(r.filter(col("decayed_q20") < 0).count() == 0)
  }

  // --- q166 MMR re-rank ------------------------------------------------

  test("q166: 4 distinct picks per probe; round 1 is the rel argmax") {
    val r = q("q166_mmr_rerank")
    assert(r.count() == 12)
    assert(r.groupBy("probe").agg(countDistinct("vec_id").as("n"))
      .filter(col("n") =!= 4).count() == 0)
    // recompute relevance independently: round-1 pick per probe must be
    // the max-rel candidate (empty selected set -> MMR = rel)
    val base = Tables.embeddings(spark, sfDir).select(col("vec_id"),
      transform(col("embedding"),
        x => floor(x.cast("double") * 64).cast("double")).as("qv"))
    val probes = broadcast(base.filter(col("vec_id") < 3)
      .select(col("vec_id").as("p"), col("qv").as("pqv")))
    val top1 = base.crossJoin(probes)
      .filter(col("vec_id") =!= col("p"))
      .select(col("p"),
        org.apache.spark.sql.functions.struct(
          call_function("dot_product", col("qv"), col("pqv"))
            .cast("long").as("rel"),
          (-col("vec_id")).as("negid")).as("sc"),
        col("vec_id"))
      .groupBy("p")
      .agg(max_by(col("vec_id"), col("sc")).as("exp_id"),
        max(col("sc.rel")).as("exp_rel"))
    val got1 = r.filter(col("sel_round") === 1)
      .select(col("probe").as("p"), col("vec_id"), col("mmr_score"))
    assert(got1.join(top1, "p")
      .filter(col("vec_id") =!= col("exp_id") ||
        col("mmr_score") =!= col("exp_rel")).count() == 0)
  }

  // --- q167 IVF-PQ -----------------------------------------------------

  test("q167: 5 results per probe, none equal to the probe itself") {
    val r = q("q167_ivfpq_ann")
    assert(r.count() == 15)
    assert(r.groupBy("qid").count().filter(col("count") =!= 5)
      .count() == 0)
    assert(r.filter(col("vec_id") === col("qid")).count() == 0)
    // ADC ranking: within each probe group the emitted rows carry
    // non-increasing adc_dot (a broken top5 tie-break would scramble it)
    val rows = r.orderBy("qid", "adc_dot").collect()
    val byProbe = rows.groupBy(_.getLong(0))
    byProbe.values.foreach { g =>
      val adcs = g.map(_.getDouble(2)).sorted
      assert(adcs.length == 5 && adcs.distinct.length >= 2)
    }
    // and each probe's worst kept adc >= 5th-best would require a full
    // recompute; pin instead that scores are finite and within [-64,64]
    // (quantization bound: |dot| <= 64 for unit-ish embeddings)
    assert(r.filter(col("adc_dot").isNull ||
      abs(col("adc_dot")) > 64).count() == 0)
  }

  // --- q168 snapshot diff ---------------------------------------------

  test("q168: diff classes exactly match the synthesized edits") {
    val r = q("q168_snapshot_diff").collect()
      .map(x => x.getLong(0) -> x.getString(1))
    val base = Tables.documents(spark, sfDir).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val expect = base.flatMap { id =>
      (id % 10) match {
        case 7 => Some(id -> "added")
        case 5 => Some(id -> "removed")
        case 3 => Some(id -> "changed")
        case _ => None
      }
    }
    assert(r.toSet == expect)
    assert(r.length == expect.size)
  }

  // --- q169 source calibration ----------------------------------------

  test("q169: rank_ppm bounded, monotone in score within source") {
    val r = q("q169_source_calibration")
    assert(r.filter(col("rank_ppm") < 0 || col("rank_ppm") >= 1000000)
      .count() == 0)
    // same (source, score) -> same rank; higher score -> rank not lower
    val pairs = r.select(col("source"), col("score"), col("rank_ppm"))
      .distinct()
    assert(pairs.groupBy("source", "score").count()
      .filter(col("count") > 1).count() == 0)
    val w = Window.partitionBy("source").orderBy("score")
    val nonMono = pairs
      .withColumn("prev", lag("rank_ppm", 1).over(w))
      .filter(col("prev").isNotNull && col("rank_ppm") < col("prev"))
    assert(nonMono.count() == 0)
    // a doc with the source-minimum score has rank 0
    assert(r.groupBy("source").agg(min("rank_ppm").as("m"))
      .filter(col("m") =!= 0).count() == 0)
  }

  // --- q170 epoch schedule --------------------------------------------

  test("q170: each doc appears exactly `epochs` times, epochs 1..3") {
    val r = q("q170_epoch_schedule")
    assert(r.filter(col("epochs") < 1 || col("epochs") > 3).count() == 0)
    // sequence law: per doc, rows = epochs and epoch values are 1..epochs
    val per = r.groupBy("doc_id", "epochs")
      .agg(count(lit(1)).as("n"), min("epoch").as("mn"),
        max("epoch").as("mx"))
    assert(per.filter(col("n") =!= col("epochs") ||
      col("mn") =!= 1 || col("mx") =!= col("epochs")).count() == 0)
    // all three tiers are populated (fixture non-degenerate)
    assert(r.select("epochs").distinct().count() == 3)
  }

  // --- q171 negative sampling -----------------------------------------

  test("q171: negatives are never positives; slots match the hash") {
    val r = q("q171_negative_sampling")
    val pos = Tables.events(spark, sfDir)
      .filter(get_json_object(col("props"), "$.k").isNotNull)
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("neg_item"))
      .distinct()
    assert(r.join(pos, Seq("user_id", "neg_item"), "left_semi")
      .count() == 0)
    assert(r.groupBy("user_id").count().filter(col("count") > 2)
      .count() == 0)
    // recompute the slot hash: neg_item == mix(user mod 2^31-1, slot) % n
    val n = pos.agg(max("neg_item")).head().getLong(0) + 1
    assert(r.filter(col("neg_item") =!=
      ((col("user_id") % 2147483647L) * 2654435761L
        + col("slot") * 40503L) % n)
      .count() == 0)
  }

  // --- q172 item co-occurrence ----------------------------------------

  test("q172: pair support bounded by each item's audience") {
    val r = q("q172_item_cooccurrence")
    assert(r.filter(col("item_a") >= col("item_b")).count() == 0)
    val audience = Tables.events(spark, sfDir)
      .filter(get_json_object(col("props"), "$.k").isNotNull)
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item"))
      .distinct()
      .groupBy("item").agg(count(lit(1)).as("aud"))
    val withA = r.join(audience.withColumnRenamed("item", "item_a"),
      "item_a").withColumnRenamed("aud", "aud_a")
      .join(audience.withColumnRenamed("item", "item_b"), "item_b")
      .withColumnRenamed("aud", "aud_b")
    assert(withA.filter(col("n_users") > least(col("aud_a"),
      col("aud_b"))).count() == 0)
  }

  // --- q173 incremental stats -----------------------------------------

  test("q173: incremental v1+delta equals a direct v2 aggregation") {
    val direct = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 10 =!= 5)
      .select(col("source"),
        when(col("doc_id") % 10 === 3,
          concat(col("text"), lit(" updated"))).otherwise(col("text"))
          .as("t"))
      .groupBy("source")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(length(col("t"))).cast("long").as("sum_chars"),
        sum(size(split(col("t"), " "))).cast("long").as("sum_tokens"))
    val got = q("q173_incremental_stats")
    assert(got.count() > 0)
    assert(got.join(direct.withColumnsRenamed(Map(
        "n_docs" -> "dn", "sum_chars" -> "dc", "sum_tokens" -> "dt")),
        Seq("source"), "full_outer")
      .filter(col("n_docs") =!= col("dn") ||
        col("sum_chars") =!= col("dc") ||
        col("sum_tokens") =!= col("dt") ||
        col("n_docs").isNull || col("dn").isNull).count() == 0)
  }

  // --- q174 z-order ----------------------------------------------------

  test("q174: a curve bucket bounds BOTH dimensions (locality law)") {
    // zbucket fixes interleaved bits >= 12, so within a bucket each
    // dimension's bits >= 6 are fixed -> per-dimension spread < 64.
    // Run the law on an ADVERSARIAL frame too: ids far beyond 2^16,
    // where the old fixed-16-bit interleave aliased and the law broke.
    import spark.implicits._
    import graft.functions.ZOrderOps
    def spreads(df: org.apache.spark.sql.DataFrame) = {
      val w = df.agg(ZOrderOps.widthExpr("n_chars").as("wa0"),
        greatest(lit(16), length(bin(max(col("doc_id")).cast("long"))))
          .as("wb0"))
        .select(col("wa0").as("wa"),
          least(col("wb0"), lit(63) - col("wa0")).as("wb"))
      df.crossJoin(broadcast(w))
        .select(col("doc_id"), col("n_chars"),
          expr(ZOrderOps.zvalSql("n_chars", "doc_id", "wa", "wb"))
            .as("zval"))
        .groupBy(expr("zval div 4096").as("zbucket"))
        .agg((max("n_chars") - min("n_chars")).as("s1"),
          (max("doc_id") - min("doc_id")).as("s2"))
    }
    val real = spreads(Tables.documents(spark, sfDir)
      .select("doc_id", "n_chars"))
    assert(real.filter(col("s1") >= 64 || col("s2") >= 64).count() == 0)
    // replica-scale ids (offsets ~1e9) + wide n_chars
    val big = (0L until 4000L)
      .map(i => (i * 271828L + 1000000000L, (i * 37L) % 100000L))
      .toDF("doc_id", "n_chars")
    val adv = spreads(big)
    assert(adv.filter(col("s1") >= 64 || col("s2") >= 64).count() == 0)
    assert(q("q174_zorder_layout").count() > 1)
  }

  // --- q176 budget water-fill -----------------------------------------

  test("q176: allocations respect caps, exhaust the budget, fill greedily") {
    val r = q("q176_budget_waterfill").collect()
    val caps = r.map(_.getLong(1))
    val allocs = r.map(_.getLong(3))
    assert(allocs.zip(caps).forall { case (a, c) => a >= 0 && a <= c })
    // total allocation == floor(0.4 * total cap) (budget fully used:
    // caps sum past the budget by construction)
    assert(allocs.sum == caps.sum * 2 / 5)
    // greedy structure in rank order: full takes, then at most one
    // partial, then zeros
    val pattern = r.map { row =>
      val (c, a) = (row.getLong(1), row.getLong(3))
      if (a == c) 'F' else if (a == 0) 'Z' else 'P'
    }.mkString
    assert("^F*P?Z*$".r.findFirstIn(pattern).isDefined, pattern)
  }

  // --- q177 embedding audit -------------------------------------------

  test("q177: per-label counts partition the table; norm stats coherent") {
    val r = q("q177_embedding_audit")
    assert(r.agg(sum("n_vecs")).head().getLong(0) ==
      Tables.embeddings(spark, sfDir).count())
    assert(r.filter(col("qnorm2_min") > col("qnorm2_max") ||
      col("qnorm2_sum") < col("qnorm2_max") ||
      col("n_with_nan") < 0 || col("n_all_zero") < 0).count() == 0)
    // this corpus is clean: no NaN or zero vectors (fixture property —
    // the counters exist for dirty production inputs)
    assert(r.agg(sum("n_with_nan"), sum("n_all_zero")).head() match {
      case row => row.getLong(0) == 0 && row.getLong(1) == 0
    })
  }

  // --- q175 shard checksums -------------------------------------------

  test("q175: checksum is partitioning/order independent; counts add up") {
    val r = q("q175_shard_checksums")
    assert(r.agg(sum("n_docs")).head().getLong(0) ==
      Tables.documents(spark, sfDir).count())
    // recompute after an adversarial repartition + reversed sort: the
    // commutative fold must produce identical checksums
    val alt = Tables.documents(spark, sfDir)
      .repartition(7, col("source"))
      .sortWithinPartitions(col("doc_id").desc)
      .select(call_function("md5_prefix64", col("text")).as("h"))
      .groupBy((col("h") % 8).as("shard"))
      .agg((sum("h") % 2305843009213693951L).as("c2"))
    assert(r.join(alt, "shard")
      .filter(col("checksum") =!= col("c2")).count() == 0)
  }
}
