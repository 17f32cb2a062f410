package graft

/** Physical-plan pins for the round-11 changes: q91's fused sketch
  * aggregate (the suite's last multi-scan-of-the-fact-table shape),
  * q237's bounded-vs-scaled broadcast split, q225's in-plan envelope
  * guard, and q239's day-1-only degree bounding — each assert encodes
  * the 100 TB property the fix bought so a silent re-plan shows up
  * here, not on a cluster.
  */
class Round11PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def plan(name: String): String =
    Inspect.explainString(SparkEntry.queries(name)(spark, sf))

  test("q91 sketches: AT MOST 2 lineitem scans — exact distincts ride " +
    "the quantile histogram as posexplode lanes; NO Expand (a " +
    "multi-distinct fuse would allocate sketch buffers per distinct " +
    "group)") {
    val p = plan("q91_sketches")
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).size <= 2, p)
    assert(!p.contains("Expand"), p)
    assert(p.contains("ObjectHashAggregate"), p) // the 3-group sketch lane
  }

  test("q237 bloom prefilter: the 65536-bounded bucket set broadcasts; " +
    "the corpus/97-scaled digest set does NOT — it builds a shuffled " +
    "hash join instead") {
    val p = plan("q237_bloom_prefilter")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("ShuffledHashJoin"), p)
  }

  test("q225 covariance: the envelope guard is a map-side filter " +
    "(hash threshold), still no Generate and no parquet scan outside " +
    "the checkpointed Gram job") {
    val p = plan("q225_emb_covariance")
    assert(!p.contains("Generate"), p)
    assert(!p.contains("Scan parquet"), p)
    assert(p.contains("Scan ExistingRDD"), p)
  }

  test("q239 canonical flip: both CC edge inputs read from eager " +
    "checkpoints (one shared pair scan, two top-32 windows) — no " +
    "parquet re-scan of the bucket self-join per day") {
    val p = plan("q239_canonical_flip")
    // documents join still scans parquet; embeddings must not appear
    assert(!p.contains("embeddings.parquet"), p)
  }

  test("q125 curation pipeline: ZERO parquet scans in the final plan — " +
    "the Gopher kernels + md5 run ONCE into a narrow (id, lang, " +
    "source, digest) eager checkpoint; the r11-verdict 6-scan shape " +
    "re-ran the text kernels per consumer") {
    val p = plan("q125_curation_pipeline")
    assert(!p.contains("Scan parquet"), p)
    assert(p.contains("Scan ExistingRDD"), p)
  }
}
