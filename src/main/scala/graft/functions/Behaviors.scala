package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The "behaviors" surface — the reference's record-name-dispatched domain
  * methods (mixin classes resolved via `__getattr__`,
  * /root/reference/src/dask_awkward/lib/core.py:1654-1684, 2741-2755; e.g.
  * `point.distance(other)` in tests/test_behavior.py:58). The idiomatic
  * Scala equivalent: implicit extension classes over struct-typed Columns
  * (compile-time dispatch instead of runtime name lookup; everything stays
  * a Catalyst expression).
  */
object Behaviors {

  /** Methods for any struct column with numeric x/y fields — mirrors the
    * reference's canonical `Point` behavior. */
  implicit class PointColumn(val c: Column) extends AnyVal {
    def x: Column = c.getField("x")
    def y: Column = c.getField("y")
    def distance(other: Column): Column =
      sqrt(pow(x - other.getField("x"), 2) + pow(y - other.getField("y"), 2))
    def magnitude: Column = sqrt(pow(x, 2) + pow(y, 2))
  }

  /** Behavior lifted elementwise into an array<struct<x,y>> column —
    * the reference applies behaviors at any nesting depth. */
  implicit class PointArrayColumn(val arr: Column) extends AnyVal {
    def magnitudes: Column =
      transform(arr, p => new PointColumn(p).magnitude)
    def distances(other: Column): Column =
      zip_with(arr, other, (a, b) => new PointColumn(a).distance(b))
  }

  /** `with_name` (structure.py:1145-1161): record names are carried as
    * column metadata — the behavior tag survives in the schema. */
  def withName(c: Column, name: String): Column = {
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putString("graft.record_name", name).build()
    c.as("value", meta)
  }

  /** `with_parameter` (structure.py:1187-1231): arbitrary layout parameters
    * carried as column metadata under a namespaced key. */
  def withParameter(c: Column, key: String, value: String,
      as: String = "value"): Column = {
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putString(s"graft.param.$key", value).build()
    c.as(as, meta)
  }

  /** `without_parameters` (structure.py:1217-1231): strip every layout
    * parameter — re-alias with empty metadata (the values are untouched,
    * exactly like the reference's map_partitions no-op on data). */
  def withoutParameters(c: Column, as: String = "value"): Column =
    c.as(as, org.apache.spark.sql.types.Metadata.empty)
}
