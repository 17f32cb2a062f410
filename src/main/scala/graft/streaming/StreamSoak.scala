package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming state-scale rehearsal (r13 verdict item 5): the three
  * stateful ops with the largest state risk, driven from a FILE-stream
  * feed of a replica directory (default /tmp/rep10 — 10x the baseline
  * corpus) in multiple micro-batches, asserting the state store's
  * numRowsTotal tracks the ANALYTIC bound rather than the stream
  * length:
  *
  *   - dedupNearStream:    one state row per distinct LSH bucket
  *   - contextPackStream:  one state row per distinct user
  *   - quantileDriftStream: one state row per distinct week
  *
  * The batch-equivalence gates in StreamingSpec prove the ops CORRECT
  * on small MemoryStreams; this main measures that their keyed state is
  * key-scale on a corpus-scale feed — the property that makes them
  * viable against a 100 TB/day stream, where events are unbounded but
  * buckets/users/weeks are not.
  *
  * Usage: runMain graft.streaming.StreamSoak [replicaDir] [feedDir]
  * Prints one `SOAK <op> state=<n> bound=<n> rows=<n> PASS|FAIL` line
  * per op plus a summary; exits nonzero on any violation.
  */
object StreamSoak {

  /** Write `df` as `files` time-ordered parquet files so the file
    * stream replays it in roughly event-time order across multiple
    * micro-batches (range partitioning makes path order track the time
    * order FileStreamSource lists in). */
  private def feed(df: DataFrame, orderCol: String, files: Int,
      dir: String): DataFrame = {
    df.repartitionByRange(files, col(orderCol))
      .sortWithinPartitions(orderCol)
      .write.mode("overwrite").parquet(dir)
    df.sparkSession.read.parquet(dir) // for .schema
  }

  private def run(q: StreamingQuery): Long = {
    try q.processAllAvailable() finally q.stop()
    q.recentProgress.filter(_.stateOperators.nonEmpty).lastOption
      .map(_.stateOperators.map(_.numRowsTotal).max).getOrElse(-1L)
  }

  def main(args: Array[String]): Unit = {
    val repDir = args.headOption.getOrElse("/tmp/rep10")
    val feedBase = if (args.length > 1) args(1) else "/tmp/soak_feed"
    val spark: SparkSession = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    var failures = 0

    def check(op: String, state: Long, bound: Long, rows: Long): Unit = {
      val ok = state == bound
      if (!ok) failures += 1
      println(s"SOAK $op state=$state bound=$bound rows=$rows " +
        (if (ok) "PASS" else "FAIL"))
    }

    // ---- dedupNearStream: state rows == distinct buckets, not docs.
    // Bucket = a 20-bit LSH-band-like key over the text prefix (the
    // q52 shape at band granularity); the 10x corpus has ~10x docs but
    // the bucket space bounds state regardless.
    val docsB = graft.Tables.documents(spark, repDir)
      .select(col("doc_id"),
        pmod(xxhash64(substring(col("text"), 1, 64)), lit(1L << 20))
          .as("bucket"))
    val nDocs = docsB.count()
    val nBuckets = docsB.select("bucket").distinct().count()
    val docFeed = feed(docsB, "doc_id", 16, s"$feedBase/docs")
    val dq = EventStreams.dedupNearStream(
        spark.readStream.schema(docFeed.schema)
          .option("maxFilesPerTrigger", 2).parquet(s"$feedBase/docs")
          .as[EventStreams.Doc])
      .writeStream.format("noop").outputMode("append")
      .option("checkpointLocation", s"$feedBase/ckpt_dedup").start()
    check("dedupNearStream", run(dq), nBuckets, nDocs)

    // ---- contextPackStream: state rows == distinct users.
    val evs = graft.Tables.events(spark, repDir)
      .select("event_id", "ts", "user_id", "event_type", "props")
    val nEvents = evs.count()
    val nUsers = evs.select("user_id").distinct().count()
    val evFeed = feed(evs, "ts", 16, s"$feedBase/events")
    val cq = EventStreams.contextPackStream(
        spark.readStream.schema(evFeed.schema)
          .option("maxFilesPerTrigger", 2).parquet(s"$feedBase/events"))
      .writeStream.format("noop").outputMode("append")
      .option("checkpointLocation", s"$feedBase/ckpt_pack").start()
    check("contextPackStream", run(cq), nUsers, nEvents)

    // ---- quantileDriftStream: state rows == distinct weeks (each row
    // a cents-histogram bounded by distinct cent values, not events).
    val vals = graft.Tables.events(spark, repDir).select("ts", "value")
    val nWeeks = vals
      .select(expr("unix_micros(ts) div 604800000000").as("wk"))
      .distinct().count()
    val vFeed = feed(vals, "ts", 16, s"$feedBase/values")
    val qq = EventStreams.quantileDriftStream(
        spark.readStream.schema(vFeed.schema)
          .option("maxFilesPerTrigger", 2).parquet(s"$feedBase/values"))
      .writeStream.format("noop").outputMode("update")
      .option("checkpointLocation", s"$feedBase/ckpt_quant").start()
    check("quantileDriftStream", run(qq), nWeeks, nEvents)

    println(s"SOAK ${if (failures == 0) "PASS" else s"FAIL ($failures)"}")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
