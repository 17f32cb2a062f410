package graft

/** Physical-plan pins for the round-10 operators: each assert encodes
  * the scale property the PLANS.md entry claims (fused GramAgg instead
  * of a Generate, MinK gathers instead of corpus-scale windows, one-pass
  * endpoint streams, bounded-histogram windows, broadcast membership
  * joins) so a regression that silently re-plans shows up here, not at
  * 100 TB.
  */
class Round10PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def plan(name: String): String =
    Inspect.explainString(SparkEntry.queries(name)(spark, sf))
  private def cols(name: String): Set[String] =
    Inspect.necessaryColumns(SparkEntry.queries(name)(spark, sf))
      .values.head.toSet

  test("q224 nDCG: one scan, broadcast probe fan-out, ONE MinK gather " +
    "groupBy (fused n_rel) — never a window") {
    val p = plan("q224_knn_ndcg")
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).size == 1, p)
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Window"), p)
  }

  test("q225 covariance: the Gram is a fused aggregate — NO Generate " +
    "anywhere; downstream reads only the checkpointed 2081-row table") {
    val p = plan("q225_emb_covariance")
    assert(!p.contains("Generate"), p)
    assert(!p.contains("Scan parquet"), p) // corpus scan ran inside the
    assert(p.contains("Scan ExistingRDD"), p) // eager checkpoint's job
  }

  test("q226 hubness: MinK gather present; the only windows are the " +
    "bucket-partitioned RP caps — never a global window") {
    val p = plan("q226_hubness")
    assert(p.contains("ObjectHashAggregate"), p)
    assert(!p.contains("partitionBy=[],"), p)
  }

  test("q227 dp release: two hash aggregates, no window, no join; " +
    "pruned to (ts, event_type, user_id)") {
    val p = plan("q227_dp_release")
    assert(!p.contains("Window"), p)
    assert(!p.contains("Join"), p)
    assert(cols("q227_dp_release") == Set("ts", "event_type", "user_id"))
  }

  test("q229 key skew: the rank window runs over the checkpointed " +
    "histogram (ExistingRDD), never over per-key rows") {
    val p = plan("q229_key_skew")
    // the only window input must be a checkpoint read, and the corpus
    // scan happens once (inside the checkpoint job -> not in this plan)
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("Scan parquet"), p)
  }

  test("q232 threshold sweep: no global window and no join beyond the " +
    "rpPairs bucket self-join (the sweep tail is pure aggregation)") {
    val p = plan("q232_threshold_sweep")
    assert(!p.contains("partitionBy=[],"), p)
    // exactly the rpPairs self-join — the sweep adds no further joins
    assert("\\(\\d+\\) \\w*HashJoin".r.findAllIn(p).size == 1, p)
    assert(!p.contains("SortAggregate"), p)
  }

  test("q233 SQ8 recall: one scan, broadcast probes, two MinK gathers " +
    "in ONE groupBy — never a window") {
    val p = plan("q233_sq8_recall")
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).size == 1, p)
    assert(p.contains("ObjectHashAggregate"), p)
    assert(!p.contains("Window"), p)
  }

  test("q234 MAD: both median windows are source-partitioned over the " +
    "checkpointed histogram; no corpus-scale window") {
    val p = plan("q234_mad_outliers")
    assert(!p.contains("partitionBy=[],"), p)
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("Scan parquet"), p)
  }

  test("q235 prefix clusters: one scan, hashed before the exchange, " +
    "no join; pruned to (text, n_chars)") {
    val p = plan("q235_prefix_clusters")
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).size == 1, p)
    assert(p.contains("md5_prefix60"), p)
    assert(!p.contains("Join"), p)
    assert(cols("q235_prefix_clusters") == Set("text", "n_chars"))
  }

  test("q236 calibration: ONE scan + block-window pairing (r11: each " +
    "shingle array ships once, doc_id div 64 blocks) — no self-join " +
    "of computed shingle tables, no fixed-cardinality partition key") {
    val p = plan("q236_minhash_calibration")
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Join"), p)
    assert(p.contains("Window"), p)
    assert(!p.contains("partitionBy=[],"), p) // never a global window
  }

  test("q237 bloom prefilter: the bounded bucket set broadcasts, the " +
    "SF-scaled digest set does not (r11 fix); the probe side is " +
    "scanned once") {
    val p = plan("q237_bloom_prefilter")
    assert("\\(\\d+\\) BroadcastHashJoin".r.findAllIn(p).size == 1, p)
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).size == 1, p)
  }
}
