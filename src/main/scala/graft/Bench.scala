package graft


/** Benchmark main (driver contract): runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Honesty + stability measures:
  *  - the action is a `noop`-format write, so every projected column is
  *    fully computed (a bare count() would let Catalyst prune all derived
  *    columns and time only the scan);
  *  - a warm-up query absorbs JVM/Catalyst JIT cost so the first measured
  *    query isn't inflated;
  *  - queries run in name order (deterministic attribution across rounds).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")

    def run(df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save()
      // queries may persist() intermediates (e.g. LSH signatures); drop
      // them so cache memory doesn't leak across measured queries
      spark.catalog.clearCache()
      // clearCache() only empties the SQL CacheManager — eager
      // localCheckpoint(true) blocks (44 query sites + GraphOps' per-round
      // barriers, several DISK_ONLY and non-evictable) bypass it and
      // accumulated across the one-JVM 208-query suite, starving unified
      // memory as the run advanced (BENCH_r09: shared-173 queries 2.46x
      // slower than r08 with per-query plans unchanged). Drop every
      // persistent RDD after each measured query so one query's barriers
      // can't tax the next.
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    // leak observability: persistent-RDD count + storage bytes AFTER the
    // per-query cleanup — a nonzero trend across the suite is the r09
    // accumulation pathology resurfacing, visible in the run log instead
    // of costing a round
    def leakStat(): String = {
      val n = spark.sparkContext.getPersistentRDDs.size
      val mem = spark.sparkContext.getExecutorMemoryStatus.values
        .map { case (max, free) => max - free }.sum
      s"rdds=$n storageUsed=${mem / (1 << 20)}MB"
    }

    // Warm-up: JIT the parquet reader, codegen, shuffle machinery.
    run(SparkEntry.entry(spark))
    run(Tables.lineitem(spark, sfDir).groupBy("l_returnflag").count())

    // Dev loop: SPARK_GRAFT_ONLY=q52_lsh_pairs,q54_jaccard benches a
    // subset. Unset (the driver's invocation) = the full suite.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.all.filter(q => names(q.name))
      case None => SparkEntry.all
    }
    val results = selected.sortBy(_.name).map { q =>
      val t0 = System.nanoTime()
      try run(q.fn(spark, sfDir))
      catch { case e: Throwable =>
        System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(
        String.format(java.util.Locale.ROOT,
          "[leak] %s %.3fs %s", q.name, Double.box(dt), leakStat()))
      q.name -> dt
    }
    // The driver keeps only the LAST 2000 BYTES of stdout and parses the
    // last line as JSON (BENCH_r01/r02 both recorded a 2000-byte tail with
    // the metric line truncated mid-key -> "parsed": null). A qNN->sec map
    // measured ~1.74 KB at 162 queries — ~100 B from truncation. The line
    // is now positional and self-describing:
    //   "qn"  — comma-joined query ids (qNN with the 'q' stripped), in the
    //           same order as the values;
    //   "queries" — per-query CENTISECOND integers ("qunit":"cs"),
    //           positionally aligned with "qn".
    // Measured 1194 B at 162 queries (~7.4 B/query) — headroom for ~90
    // more under the 2000 B tail. The exact 3-decimal full-name map still
    // goes to stderr for humans/bench_guard notes.
    // Locale.ROOT: the default-locale interpolator would print "1,374"
    // under a comma-decimal locale and corrupt the JSON
    def ms(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val shortKeys = results.map(_._1.takeWhile(_ != '_'))
    require(shortKeys.distinct.length == shortKeys.length,
      "duplicate qNN prefixes would silently collapse metric-line keys: " +
        shortKeys.diff(shortKeys.distinct).mkString(","))
    val qn = results.map(_._1.takeWhile(_ != '_').drop(1)).mkString(",")
    val qcs = results.map { case (_, v) => math.round(v * 100).toString }
      .mkString("[", ",", "]")
    val full = results.map { case (k, v) => "\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    System.err.println(s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$full,"sf":"$sfDir"}""")
    // Print AFTER spark.stop(): nothing (shutdown banners, executor logs)
    // may land on stdout behind the metric line — the driver parses the
    // LAST stdout line as JSON.
    spark.stop()
    val line =
      s"""{"metric":"total","value":${ms(total)},"unit":"sec","qunit":"cs","qn":"$qn","queries":$qcs,"sf":"$sfDir"}"""
    // the driver keeps only the last 2000 stdout bytes; fail LOUDLY before
    // the suite silently reproduces the truncated-line "parsed": null
    require(line.length <= 1700,
      s"metric line ${line.length} bytes — would truncate in the driver's 2000-byte tail")
    println(line)
    System.out.flush()
  }
}
