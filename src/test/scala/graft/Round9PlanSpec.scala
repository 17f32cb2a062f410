package graft

/** Physical-plan pins for the round-9 operators: each assert encodes the
  * scale property the PLANS.md entry claims (map-only, bounded windows,
  * MinK gathers instead of corpus-scale windows, checkpoint barriers,
  * pruned scans) so a regression that silently re-plans shows up here,
  * not at 100 TB.
  */
class Round9PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def plan(name: String): String =
    Inspect.explainString(SparkEntry.queries(name)(spark, sf))
  private def cols(name: String): Set[String] =
    Inspect.necessaryColumns(SparkEntry.queries(name)(spark, sf))
      .values.head.toSet

  test("q208 chunking: one scan, no join, hashed before the exchange, " +
    "pruned to (source, text)") {
    val p = plan("q208_rag_chunking")
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Join"), p)
    assert(p.contains("md5_prefix60"), p)
    assert(cols("q208_rag_chunking") == Set("source", "text"))
  }

  test("q209 winnowing: ONE doc-partitioned window (never global), " +
    "grams hashed map-side, pruned to (doc_id, text)") {
    val p = plan("q209_winnowing")
    assert("\\(\\d+\\) Window\\b".r.findAllIn(p).size == 1, p)
    assert(!p.contains("partitionBy=[],"), p)
    assert(p.contains("md5_prefix60"), p)
    assert(cols("q209_winnowing") == Set("doc_id", "text"))
  }

  test("q210 collocations: checkpointed vocab read twice (no third " +
    "corpus scan), top-64 is TakeOrdered") {
    val p = plan("q210_collocations")
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).size == 1, p)
    assert("Scan ExistingRDD".r.findAllIn(p).size >= 2, p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q211 contribution cap: one user-partitioned window, no join, " +
    "pruned scan") {
    val p = plan("q211_contribution_cap")
    assert("\\(\\d+\\) Window\\b".r.findAllIn(p).size == 1, p)
    assert(!p.contains("partitionBy=[],"), p)
    assert(!p.contains("Join"), p)
    assert(cols("q211_contribution_cap") ==
      Set("event_id", "ts", "user_id", "event_type"))
  }

  test("q213 freshness: pure map + aggregates — no window, no join; " +
    "pruned to (user_id, ts, value)") {
    val p = plan("q213_freshness")
    assert(!p.contains("Window"), p)
    assert(!p.contains("Join"), p)
    assert(cols("q213_freshness") == Set("user_id", "ts", "value"))
  }

  test("q214 fertility: single map stage — no explode, no join, one " +
    "scan") {
    val p = plan("q214_tokenizer_fertility")
    assert(!p.contains("Generate"), p)
    assert(!p.contains("Join"), p)
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).size == 1, p)
    assert(cols("q214_tokenizer_fertility") ==
      Set("lang", "n_chars", "text"))
  }

  test("q215/q216/q218: MinK gathers (ObjectHashAggregate), NEVER a " +
    "window over probe-count partitions") {
    for (q <- Seq("q215_ivf_recall", "q216_hard_negatives",
        "q218_maxsim")) {
      val p = plan(q)
      assert(p.contains("ObjectHashAggregate"), s"$q\n$p")
      assert(!p.contains("Window"), s"$q\n$p")
      assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).size == 1,
        s"$q\n$p")
    }
  }

  test("q217 PQ distortion: the pair self-join reads the 48-row " +
    "checkpoint twice and NEVER re-plans the corpus subtree") {
    // the MinK gather runs inside the eager checkpoint's job; the
    // returned plan must contain ONLY checkpoint reads — a parquet scan
    // here would mean the corpus pipeline re-planned per join side
    val p = plan("q217_pq_distortion")
    assert("Scan ExistingRDD".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("Scan parquet"), p)
    assert(!p.contains("Window"), p)
  }

  test("q219 span corruption: closed-form arithmetic — no explode, no " +
    "join, no window; pruned to (lang, text)") {
    val p = plan("q219_span_corruption")
    assert(!p.contains("Generate"), p)
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p)
    assert(cols("q219_span_corruption") == Set("lang", "text"))
  }

  test("q220 dedup shift: both lang tables are checkpoint reads (the " +
    "scalar totals never re-plan the corpus scans)") {
    val p = plan("q220_dedup_shift")
    assert("Scan ExistingRDD".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("Window"), p)
  }

  test("q221 mix drift: bounded (week,type) checkpoint feeds grid + " +
    "lag; the lag window is type-partitioned") {
    val p = plan("q221_mix_drift")
    assert("Scan ExistingRDD".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("partitionBy=[],"), p)
  }

  test("q222 vocab coverage: top-16 cut is TakeOrdered, OOV flag is a " +
    "broadcast join, two pruned scans") {
    val p = plan("q222_vocab_coverage")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).size == 2, p)
    // both scans pruned (necessaryColumns keys by path, so the two
    // same-table scans collide there — read the schemas off the plan):
    // vocab side to (text), flag side to (lang, text)
    assert(p.contains("ReadSchema: struct<text:string>"), p)
    assert(p.contains("ReadSchema: struct<text:string,lang:string>"), p)
  }
}
