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

  /** Salted equi-join for a skewed LEFT (fact) side: the dimension side is
    * replicated `saltBuckets` times (explode over the salt range — fine
    * for dimension tables, the side that is small-per-key but too big or
    * too key-skewed to broadcast whole), the fact side gets a
    * DETERMINISTIC per-row salt from a row hash, and the join keys on
    * (key, salt) — a hot key's rows now land on `saltBuckets` reducers
    * instead of one. Semantically identical to `left.join(right, keys)`
    * for any 1-row-per-key right side; the salt never leaves the join.
    * This is the explicit form of what AQE skew-split does at runtime —
    * needed when a single key exceeds what one split can absorb, or when
    * the optimizer's stats miss the skew (computed keys).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltBuckets: Int): DataFrame = {
    val saltedL = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*),
        lit(saltBuckets.toLong)).cast("int"))
    val saltedR = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedL.join(saltedR, Seq(key, "__salt")).drop("__salt")
  }
}
