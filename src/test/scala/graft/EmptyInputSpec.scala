package graft

/** Empty-corpus robustness: every corpus-facing query must run (and
  * return an empty or degenerate-but-well-formed result) on zero-row
  * inputs with the production schemas — the first thing a new deployment
  * or an over-aggressive upstream filter feeds the engine. Guards against
  * head()/first()-style assumptions and divide-by-zero in fixed-point
  * arithmetic.
  */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-empty").toString
    Seq("documents", "embeddings", "events", "lineitem", "orders").foreach {
      t =>
        Tables.table(spark, "/root/testdata/sf0.001", t)
          .limit(0).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private val corpusQueries = Seq(
    "q142_bpe_vocab", "q143_cdc_chunks", "q144_pmi_colloc",
    "q145_shuffle_shard", "q147_corpus_report", "q148_bpe_encode",
    "q150_adaptive_filter", "q152_curriculum", "q153_engagement_select",
    "q154_cross_source_dups", "q151_hard_negatives", "q149_rrf_fusion",
    "q50_dedup_exact", "q95_tfidf", "q131_heavy_hitters")

  corpusQueries.foreach { name =>
    test(s"$name runs on an empty corpus") {
      val rows = SparkEntry.queries(name)(spark, emptyDir).collect()
      assert(rows != null) // no exception is the contract; row count varies
    }
  }
}
