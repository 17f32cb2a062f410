package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers. AQE's skew-join splitting handles most cases at
  * runtime; salted aggregation is the explicit tool for pathological
  * hot-key aggregations (one key holding a double-digit percentage of a
  * 100 TB table), where even a split partition funnels into one reducer
  * for the final merge.
  */
object Skew {

  /** Two-stage salted aggregation: group by (key, salt) first — spreading a
    * hot key over `saltBuckets` reducers — then merge the partials by key.
    * `partials` aggregate raw rows; `merges` combine the partial columns
    * (e.g. partial `sum(x) as s` merges with `sum(s)`).
    */
  def saltedAgg(df: DataFrame, key: Column, saltBuckets: Int,
      partials: Seq[Column], merges: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltBuckets)).cast("int"))
    val partial = salted
      .groupBy(key.as("__key"), col("__salt"))
      .agg(partials.head, partials.tail: _*)
    partial.groupBy(col("__key"))
      .agg(merges.head, merges.tail: _*)
      .withColumnRenamed("__key", "key")
  }
}
