package graft

import org.apache.spark.sql.functions._

/** Round-7 curation operators: PII redaction (q120), SemDeDup
  * cluster-scoped near-dup (q121), Gopher composite rule filter (q122).
  * Value-level cross-engine checks are the DuckDB oracle gate; these specs
  * pin the semantic invariants the gate can't see (redaction idempotence,
  * cluster scoping, bitmask/keep consistency).
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.queries(name)(spark, sfDir)

  // --- q120 PII redaction ---------------------------------------------

  private val emailPat = graft.functions.TextOps.EmailPat
  private val phonePat = graft.functions.TextOps.PhonePat
  private val ipPat = graft.functions.TextOps.IpPat

  test("q120: every doc detects the synthetic email/phone/ip") {
    val r = q("q120_pii_redact")
    assert(r.filter(col("n_email") < 1 || col("n_phone") < 1 ||
      col("n_ip") < 1).count() == 0)
    // doc_id % 3 == 0 rows carry the second (cc'd) email — exact count,
    // valid for any doc_id distribution
    assert(r.filter(col("n_email") === 2).count() ==
      r.filter(col("doc_id") % 3 === 0).count())
  }

  test("q120: redaction removes every match (scan of redacted = 0)") {
    // rebuild the augmented+redacted text exactly as the query does and
    // assert a re-scan finds nothing — redaction is a fixpoint
    val id = col("doc_id")
    val aug = concat(col("text"), lit(" contact user"), id.cast("string"),
      lit("@mail.example.com"),
      when(id % 3 === 0, concat(lit(" cc admin"), id.cast("string"),
        lit("@mail.example.com"))).otherwise(lit("")),
      lit(" call "), (id % 900 + 100).cast("string"), lit("-555-"),
      lpad((id % 10000).cast("string"), 4, "0"),
      lit(" ip 10."), (id % 256).cast("string"), lit(".0."),
      ((id * 7) % 256).cast("string"))
    val red = regexp_replace(regexp_replace(regexp_replace(aug,
      emailPat, "[EMAIL]"), phonePat, "[PHONE]"), ipPat, "[IP]")
    val rescan = Tables.documents(spark, sfDir)
      .select((size(regexp_extract_all(red, lit(emailPat), lit(0)))
        + size(regexp_extract_all(red, lit(phonePat), lit(0)))
        + size(regexp_extract_all(red, lit(ipPat), lit(0)))).as("left"))
    assert(rescan.agg(sum("left")).head().getLong(0) == 0L)
  }

  test("q120: patterns behave on crafted corner cases") {
    val df = Seq(
      ("a@b.co and x.y-z@mail.example.com", 2, 0, 0),
      ("ip 255.255.255.255 end", 0, 0, 1),
      ("1234.1.2.3 is no ip prefix but 234.1.2.3 matches inside", 0, 0, 1),
      ("call 123-555-0000 or 999-555-9999", 0, 2, 0),
      ("nothing here", 0, 0, 0)).toDF("t", "ne", "np", "ni")
    val bad = df.filter(
      size(regexp_extract_all(col("t"), lit(emailPat), lit(0))) =!= col("ne")
        || size(regexp_extract_all(col("t"), lit(phonePat), lit(0))) =!= col("np")
        || size(regexp_extract_all(col("t"), lit(ipPat), lit(0))) =!= col("ni"))
    assert(bad.count() == 0)
  }

  test("q120 law: marker-delta span counts equal independent 6-pass counts on non-nested input") {
    // the production 3-pass shape (redact once, count marker deltas) must
    // agree with the retained 6-pass oracle (independent regexp_extract_all
    // per pattern) whenever no match nests inside another — which the q120
    // corpus guarantees (emails carry no embedded IPs/phones)
    import graft.functions.TextOps
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), concat(col("text"),
        lit(" u"), col("doc_id").cast("string"), lit("@x.example.org"),
        lit(" 207-555-0101 at 10.1.2."),
        (col("doc_id") % 250).cast("string")).as("t"))
      .select(col("doc_id"), col("t"), TextOps.piiRedact(col("t")).as("r"))
    val Seq(e6, p6, i6) = TextOps.piiCounts(col("t"))
    val bad = docs.filter(
      TextOps.redactedSpanCounts(col("t"), col("r"), "[EMAIL]") =!= e6
        || TextOps.redactedSpanCounts(col("t"), col("r"), "[PHONE]") =!= p6
        || TextOps.redactedSpanCounts(col("t"), col("r"), "[IP]") =!= i6)
    assert(bad.count() == 0)
  }

  test("q120 law: pre-existing literal markers do not inflate span counts") {
    import graft.functions.TextOps
    // input already containing [EMAIL]/[IP] text: plain markerCount over
    // the redacted string would over-count; the delta form stays exact
    val df = Seq(
      ("[EMAIL] was already here, plus real a@b.co", 1L, 0L, 0L),
      ("[IP] [IP] and 10.0.0.1", 0L, 0L, 1L),
      ("[PHONE] only, nothing real", 0L, 0L, 0L)).toDF("t", "ne", "np", "ni")
      .select(col("t"), col("ne"), col("np"), col("ni"),
        TextOps.piiRedact(col("t")).as("r"))
    val bad = df.filter(
      TextOps.redactedSpanCounts(col("t"), col("r"), "[EMAIL]") =!= col("ne")
        || TextOps.redactedSpanCounts(col("t"), col("r"), "[PHONE]") =!= col("np")
        || TextOps.redactedSpanCounts(col("t"), col("r"), "[IP]") =!= col("ni"))
    assert(bad.count() == 0)
  }

  // --- q121 SemDeDup ---------------------------------------------------

  test("q121: pairs are within-cluster, ordered, above threshold") {
    val r = q("q121_semdedup").cache()
    assert(r.count() > 0)
    assert(r.filter(col("id_a") >= col("id_b")).count() == 0)
    assert(r.filter(col("sim") < 0.40).count() == 0)
    // cluster ids come from the seed set (vec_id < K = 8 at this sf)
    assert(r.filter(col("cluster") >= 8).count() == 0)
    r.unpersist()
  }

  test("q121: cluster scoping is consistent — both endpoints assign to the pair's cluster") {
    // recompute the assignment exactly as the query does, then check every
    // reported pair endpoint lands in the reported cluster
    val emb = Tables.embeddings(spark, sfDir)
    val ei = emb.select(col("vec_id"),
      graft.functions.ArrayOps.bindOnce(transform(col("embedding"),
        x => round(x.cast("double") * 10000).cast("long")))(v =>
        transform(v, y => y.cast("double") / 10000.0)).as("vs"))
    val seeds = ei.filter(col("vec_id") < 8)
      .select(col("vec_id").as("sid"), col("vs").as("cs"))
    val dist = graft.functions.TextOps.dot(col("vs"), col("vs")) -
      lit(2.0) * graft.functions.TextOps.dot(col("vs"), col("cs")) +
      graft.functions.TextOps.dot(col("cs"), col("cs"))
    val pairs = ei.crossJoin(broadcast(seeds))
      .select(col("vec_id"), col("sid"), dist.as("dist"))
    val best = pairs.groupBy("vec_id").agg(min("dist").as("md"))
    val assigned = pairs.join(best, "vec_id")
      .filter(col("dist") === col("md"))
      .groupBy("vec_id").agg(min("sid").as("cluster"))
    val r = q("q121_semdedup")
    val viaA = r.join(assigned.withColumnRenamed("vec_id", "id_a"),
      Seq("id_a", "cluster"), "left_anti")
    val viaB = r.join(assigned.withColumnRenamed("vec_id", "id_b"),
      Seq("id_b", "cluster"), "left_anti")
    assert(viaA.count() == 0 && viaB.count() == 0)
  }

  // --- q123 BM25 / q48 BPE merge --------------------------------------

  test("q123: at most 10 docs per term, scores positive, tf=0 docs absent") {
    val r = q("q123_bm25").cache()
    assert(r.groupBy("term").count().filter(col("count") > 10).count() == 0)
    assert(r.filter(col("score") <= 0).count() == 0)
    // every scored doc really contains its term
    val toks = Tables.documents(spark, sfDir).select(col("doc_id"),
      graft.functions.TextOps.tokens(col("text")).as("ws"))
    val missing = r.join(toks, "doc_id")
      .filter(!array_contains(col("ws"), col("term")))
    assert(missing.count() == 0)
    r.unpersist()
  }

  test("q48: merge candidates are 2-char bigrams with descending counts") {
    val rows = q("q48_bpe_merge").collect()
    assert(rows.length == 20)
    assert(rows.forall(_.getString(0).length == 2))
    val counts = rows.map(_.getLong(1))
    assert(counts.sliding(2).forall { case Array(a, b) => a >= b })
  }

  test("q121 law: hierarchical assignment with coarse ⊇ seeds equals flat argmin") {
    // the degeneracy claim the K ≤ 16 flat shortcut rests on: when every
    // seed is its own coarse cell, the two-level IVF probe must reproduce
    // the flat argmin EXACTLY (seed self-assignment has dist exactly 0.0;
    // vector cell choice = flat argmin over all seeds; fine stage then
    // sees exactly the winning seed)
    import graft.functions.TextOps.dot
    val ei = Tables.embeddings(spark, sfDir).select(col("vec_id"),
      transform(transform(col("embedding"),
        x => round(x.cast("double") * 10000).cast("long")),
        y => y.cast("double") / 10000.0).as("vs"))
      .withColumn("vv", dot(col("vs"), col("vs")))
    val seeds = ei.filter(col("vec_id") < 8)
      .select(col("vec_id").as("sid"), col("vs").as("cs"))
      .withColumn("cc", dot(col("cs"), col("cs")))
    def argmin(cands: org.apache.spark.sql.DataFrame, key: String,
        value: String, out: String) = {
      val best = cands.groupBy(key).agg(min(col("dist")).as("md"))
      cands.join(best, key).filter(col("dist") === col("md"))
        .groupBy(key).agg(min(col(value)).as(out))
    }
    def dist(v: org.apache.spark.sql.Column, vvc: org.apache.spark.sql.Column,
        c: org.apache.spark.sql.Column, ccc: org.apache.spark.sql.Column) =
      vvc - lit(2.0) * dot(v, c) + ccc
    val flat = argmin(ei.crossJoin(broadcast(seeds))
      .select(col("vec_id"), col("sid"),
        dist(col("vs"), col("vv"), col("cs"), col("cc")).as("dist")),
      "vec_id", "sid", "cluster")
    // hierarchical with coarse = ALL seeds
    val coarse = seeds.select(col("sid").as("cid"), col("cs").as("gcs"),
      col("cc").as("gcc"))
    val scell = argmin(seeds.crossJoin(broadcast(coarse))
      .select(col("sid"), col("cid"),
        dist(col("cs"), col("cc"), col("gcs"), col("gcc")).as("dist")),
      "sid", "cid", "cell")
    val vcell = argmin(ei.crossJoin(broadcast(coarse))
      .select(col("vec_id"), col("cid"),
        dist(col("vs"), col("vv"), col("gcs"), col("gcc")).as("dist")),
      "vec_id", "cid", "cell")
    val cellSeeds = seeds.join(scell, "sid")
    val hier = argmin(ei.join(vcell, "vec_id")
      .join(broadcast(cellSeeds), "cell")
      .select(col("vec_id"), col("sid"),
        dist(col("vs"), col("vv"), col("cs"), col("cc")).as("dist")),
      "vec_id", "sid", "cluster")
    // every seed self-assigns (dist exactly 0.0)
    assert(scell.filter(col("sid") =!= col("cell")).count() == 0)
    assert(flat.join(hier, Seq("vec_id", "cluster")).count() == flat.count()
      && flat.count() == ei.count())
  }

  // --- q124 temperature mixing ----------------------------------------

  test("q124: sqrt-temperature flattens the language skew; picked tracks target") {
    val r = q("q124_temperature_mix").collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3))))
      .toMap
    val (nEn, tEn, _) = r("en")
    // en is the majority language; α=0.5 must give it LESS than its
    // proportional share of the half-corpus budget
    val ntot = r.values.map(_._1).sum
    assert(tEn.toDouble / (ntot / 2) < nEn.toDouble / ntot)
    // minority languages keep a larger-than-proportional share
    val (nDe, tDe, _) = r("de")
    assert(tDe.toDouble / (ntot / 2) > nDe.toDouble / ntot)
    // hash-threshold selection lands binomially close to target (5 sigma)
    r.values.foreach { case (n, target, picked) =>
      val p = target.toDouble / n
      val sigma = math.sqrt(n * p * (1 - p))
      assert(math.abs(picked - target) <= 5 * sigma + 1,
        s"picked $picked vs target $target (n=$n)")
    }
  }

  // --- q125 composed pipeline -----------------------------------------

  test("q125: manifest is consistent with its stages") {
    val r = q("q125_curation_pipeline").cache()
    val q122r = q("q122_gopher_rules").filter(col("keep"))
    val keptN = q122r.count()
    val picked = r.agg(sum("picked")).head().getLong(0)
    // mixing budget is half the deduped survivor corpus — picked can
    // never exceed the survivors, and lands well under them
    assert(picked > 0 && picked < keptN)
    // every manifest row is a real (lang, source) group with >= 1 doc
    assert(r.filter(col("picked") < 1).count() == 0)
    r.unpersist()
  }

  // --- q122 Gopher rules ----------------------------------------------

  test("q122: keep iff fail_mask == 0; bits match their rules") {
    val r = q("q122_gopher_rules").cache()
    assert(r.filter(col("keep") =!= (col("fail_mask") === 0)).count() == 0)
    // bit 0 = word-count rule (rounded stats re-derive the other bits only
    // approximately, so check the exact integer one plus mask range)
    assert(r.filter((col("fail_mask").bitwiseAND(1) === 1) =!=
      !col("n_words").between(20, 50000)).count() == 0)
    assert(r.filter(col("fail_mask") < 0 || col("fail_mask") > 15).count() == 0)
    // thresholds actually split the corpus: some kept, some dropped
    val kept = r.filter(col("keep")).count()
    assert(kept > 0 && kept < r.count())
    r.unpersist()
  }
}
