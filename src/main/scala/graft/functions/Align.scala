package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Cross-collection alignment — SURVEY §7.4 item 2. The reference zips two
  * independently-loaded collections when their partitioning is compatible
  * (`partition_compatibility`, core.py:2883-2938). Spark expressions over
  * one DataFrame are aligned by construction; for two INDEPENDENT
  * DataFrames the engine provides an explicit row-index equi-join.
  *
  * Cost note (by design, documented like the reference documents
  * IncompatiblePartitions): zipWithIndex is a narrow transformation (one
  * count job + per-partition offsets, no shuffle), but the equi-join on the
  * index is a full shuffle of both sides — this is inherently the price of
  * aligning collections with no common lineage.
  */
object Align {

  /** Stable 0-based row index in current partition order (no shuffle). */
  def withRowIndex(df: DataFrame, name: String = "__row_idx"): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField(name, LongType, nullable = false))
    df.sparkSession.createDataFrame(
      df.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) },
      schema)
  }

  /** Positionally zip two DataFrames (reference: elementwise combination of
    * two partition-compatible arrays). Row counts must match. */
  def zipCollections(a: DataFrame, b: DataFrame): DataFrame = {
    val ai = withRowIndex(a, "__idx_a")
    val bi = withRowIndex(b, "__idx_b")
    ai.join(bi, col("__idx_a") === col("__idx_b"))
      .drop("__idx_a", "__idx_b")
  }
}
