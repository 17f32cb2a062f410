package graft

/** Dev-only perf probe: run selected queries repeatedly, print per-run
  * times (never committed into driver flows; see Bench for the contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("PROBE_REPS", "3").toInt
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q51_minhash_sig", "q52_lsh_pairs", "q53_simhash",
        "q54_jaccard", "q59_cosine_dups", "q80_nested_roundtrip",
        "q81_pipeline")
    val byName = SparkEntry.all.map(q => q.name -> q).toMap
    // warm-up
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    for (n <- names; r <- 1 to reps) {
      val t0 = System.nanoTime()
      byName(n).fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      println(f"[probe] $n run$r ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
