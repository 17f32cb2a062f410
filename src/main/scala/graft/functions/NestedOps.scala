package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-recursive elementwise expression builder — the engine's analogue of
  * Awkward broadcasting (reference: dask-awkward `Array.__array_ufunc__`,
  * src/dask_awkward/lib/core.py:1756-1769, which maps a NumPy ufunc over an
  * arbitrarily nested layout). Here the "layout walk" is a recursion over the
  * Spark `DataType`, emitting nested `transform(...)` higher-order functions
  * around the leaf expression, so the whole thing stays inside Catalyst /
  * whole-stage codegen (no UDFs).
  */
object NestedOps {

  /** Apply `f` to every leaf (non-array, non-struct) value reachable from
    * column `c` of type `dt`, preserving the nesting structure.
    * Equivalent of mapping a unary ufunc over a nested awkward array
    * (reference core.py:2216-2224 docstring example).
    */
  def mapLeaves(c: Column, dt: DataType)(f: (Column, DataType) => Column): Column =
    dt match {
      case ArrayType(et, _) => transform(c, x => mapLeaves(x, et)(f))
      case st: StructType =>
        struct(st.fields.toIndexedSeq.map(fld =>
          mapLeaves(c.getField(fld.name), fld.dataType)(f).as(fld.name)): _*)
      case leaf => f(c, leaf)
    }

  /** Binary elementwise combination of two structurally-identical nested
    * columns (reference: broadcasting of two aligned arrays, core.py:1756 +
    * partition_compatibility core.py:2883 — alignment in Spark is by
    * construction, both sides are expressions over one DataFrame).
    */
  def zipLeaves(a: Column, b: Column, dt: DataType)(f: (Column, Column) => Column): Column =
    dt match {
      case ArrayType(et, _) => zip_with(a, b, (x, y) => zipLeaves(x, y, et)(f))
      case st: StructType =>
        struct(st.fields.toIndexedSeq.map(fld =>
          zipLeaves(a.getField(fld.name), b.getField(fld.name), fld.dataType)(f)
            .as(fld.name)): _*)
      case _ => f(a, b)
    }

  /** Broadcast a scalar into the nesting of `c` and combine — e.g. `arr + 1`
    * on a doubly-nested list (reference core.py:2216-2224).
    */
  def broadcastScalar(c: Column, dt: DataType, s: Column)(f: (Column, Column) => Column): Column =
    mapLeaves(c, dt)((leaf, _) => f(leaf, s))

  /** Cast every leaf to `to` — reference `values_astype`
    * (src/dask_awkward/lib/structure.py:957-976). */
  def valuesAstype(c: Column, dt: DataType, to: DataType): Column =
    mapLeaves(c, dt)((leaf, _) => leaf.cast(to))

  /** Same-shape constant fill — reference `full_like`/`zeros_like`/`ones_like`
    * (structure.py:479-505, 1234-1252, 672-690). */
  def fullLike(c: Column, dt: DataType, v: Column): Column =
    mapLeaves(c, dt)((_, _) => v)

  /** Coerce a nested column to a target schema — reference `enforce_type`
    * (structure.py:1349-1368). Spark's cast handles arbitrary nested
    * retyping (array/struct recursion included). */
  def enforceType(c: Column, to: DataType): Column = c.cast(to)
}
