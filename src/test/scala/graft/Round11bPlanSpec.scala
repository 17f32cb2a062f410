package graft

/** Physical-plan pins for the round-11 operator batch (q240–q247):
  * each assert encodes the scale property the plan was designed around
  * — single materializations of shared corpus subtrees, per-row kernels
  * instead of corpus-by-character exchanges, fused MinKAgg gathers,
  * statistics-driven (never forced) dimension broadcasts — so a silent
  * re-plan surfaces here, not on a cluster.
  */
class Round11bPlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def plan(name: String): String =
    Inspect.explainString(SparkEntry.queries(name)(spark, sf))

  test("q240 kmv: the distinct subtree recomputes per consumer (the " +
    "r11 A/B beat a DISK_ONLY barrier at every replica scale): one " +
    "parquet scan drives the intersection; the tiny sketch aggregate " +
    "is checkpointed once and read twice by its self-cross") {
    val p = plan("q240_kmv_overlap")
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).size == 1, p)
    // the |sources|-row sketch agg checkpoint read twice (self-cross)
    assert("\\(\\d+\\) Scan ExistingRDD".r.findAllIn(p).size == 2, p)
  }

  test("q241 triangles: per-node rollup BEFORE the label attach — the " +
    "wedge and closure joins run over the checkpointed edge RDD, and " +
    "the label join input is the aggregated node table, never wedges") {
    val p = plan("q241_triangles")
    // the label join must sit above the first aggregate pair: in tree
    // order the per-node rollup prints before the edge joins
    val aggIdx = p.indexOf("HashAggregate")
    val shjIdx = p.indexOf("ShuffledHashJoin")
    assert(aggIdx >= 0 && shjIdx >= 0 && aggIdx < shjIdx,
      "per-node rollup must appear above the edge joins\n" + p)
    // edge side: 3 reads of ONE eager checkpoint, no re-derivation
    assert("\\(\\d+\\) Scan ExistingRDD".r.findAllIn(p).size == 3, p)
  }

  test("q245 char diversity: ONE corpus exchange — the Σf² rides the " +
    "codegen'd bigram_sq_sum kernel (no Generate, no per-character " +
    "explode), scan pruned to (text, source)") {
    val p = plan("q245_char_diversity")
    assert(!p.contains("Generate"), p)
    assert(p.contains("ReadSchema: struct<text:string,source:string>"), p)
    // agg exchange + final-sort exchange only
    assert("(?m)^\\s*\\+?-? ?Exchange ".r.findAllIn(p).size <= 2, p)
  }

  test("q246 batch collision: the signature subtree materializes ONCE " +
    "(DISK_ONLY checkpoint) for both the assignment and the truth " +
    "side; batch assignment is a map stage (no global sort operator " +
    "before the group-by)") {
    val p = plan("q246_batch_collision")
    assert(!p.contains("Scan parquet"), p)
    assert("\\(\\d+\\) Scan ExistingRDD".r.findAllIn(p).size == 2, p)
    assert(!p.contains("Window"), p)
  }

  test("q247 matryoshka: ONE corpus scan pruned to (vec_id, embedding), " +
    "16 probes broadcast, all three top-10s in ONE ObjectHashAggregate " +
    "pair (fused MinKAgg gathers — never a window over corpus-scale " +
    "partitions)") {
    val p = plan("q247_matryoshka_recall")
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).size == 2, p) // corpus + probes
    assert(p.contains("ReadSchema: struct<vec_id:bigint,embedding:array<float>>"), p)
    assert(!p.contains("Window"), p)
    assert("\\(\\d+\\) ObjectHashAggregate".r.findAllIn(p).size == 2, p) // partial+final
  }

  test("q252 centroid drift: ONE corpus scan, the posexplode collapses " +
    "map-side into (label, half, dim) partial sums — no Window, no " +
    "join, three bounded rollups above it") {
    val p = plan("q252_centroid_drift")
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).size == 1, p)
    assert("\\(\\d+\\) Generate".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("Join"), p)
  }

  test("q253 chain depth: the BFS ran at construction — the final plan " +
    "unions checkpointed node sets with ONE parquet scan (the isolated-" +
    "node universe); no Window, no Generate") {
    val p = plan("q253_chain_depth")
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("Generate"), p)
  }

  test("q254 vocab coverage: shingles hash to fixed width BEFORE the " +
    "exchange (no computed strings on the wire) — one scan, the " +
    "(source, h) partial agg below the first exchange") {
    val p = plan("q254_vocab_coverage")
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).size == 1, p)
    assert(p.contains("md5_prefix64"), p)
    assert(!p.contains("Window"), p)
  }

  test("q242 burstiness: the corpus crosses the wire once — the first " +
    "exchange keys (user, type, hour) with a map-side partial agg " +
    "below it; later exchanges are user-scale") {
    val p = plan("q242_burstiness")
    assert(!p.contains("Window"), p)
    assert(!p.contains("Generate"), p)
    val first = p.indexOf("Exchange")
    assert(first >= 0 && p.indexOf("HashAggregate", first) > 0, p)
  }
}
