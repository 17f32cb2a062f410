package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access over the driver-generated testdata directory layout
  * (TESTDATA.md): one parquet file per table in `$dir/<name>.parquet`.
  *
  * Kept deliberately thin: `spark.read.parquet` gives us Catalyst's
  * FileSourceScan with column pruning + predicate pushdown + row-group
  * skipping for free — the reference hand-rolls exactly this
  * ("necessary columns", /root/reference/src/dask_awkward/lib/optimize.py:69-223).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** `events.ts` arrives as either parquet TIMESTAMP(MICROS) (readable
    * directly) or TIMESTAMP(NANOS), which Spark 4 refuses to read as a
    * timestamp. For the nanos layout, read raw nanos (legacy conf) and
    * rebuild a microsecond timestamp with integer division (nanos exceed
    * 2^53, so `div`, never double `/`). DuckDB truncates ns→us the same
    * way, so both generations hash identically through the gate.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        // Session TZ is pinned to UTC (GraftSession), so NTZ→LTZ is a
        // semantic no-op; LTZ keeps epoch-arithmetic casts (ts AS DOUBLE)
        // legal, matching the type the nanos path produces.
        raw.withColumn("ts", raw("ts").cast(
          org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

/** One registered query: the Spark-native implementation plus (optionally)
  * the equivalent ANSI SQL the driver runs in DuckDB as the oracle.
  * Column names MUST match between the two (the driver sorts columns by
  * name before hashing); every query orders its output deterministically
  * so row order can never be a source of mismatch.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, sql: String)(
      fn: (SparkSession, String) => DataFrame): Q = Q(name, fn, Some(sql))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
