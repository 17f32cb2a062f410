package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic scalar serialization for array-typed query OUTPUTS.
  *
  * The driver's correctness harness pandas-sorts result rows over all
  * output columns; array-typed cells crash that sort (unhashable
  * numpy.ndarray) and void the whole query's check. Gate-facing queries
  * therefore serialize list outputs to JSON text: `to_json` on the Spark
  * side, `to_json(...)::VARCHAR` in the DuckDB oracle. Both engines agree
  * byte-for-byte on integer, boolean, string and struct elements, on
  * in-list nulls (`[1,null,3]`) and on empty lists (`[]`).
  *
  * Float elements do NOT round-trip identically (Spark/Jackson writes
  * `1.0E-7` where DuckDB writes `1e-07`, and DuckDB promotes FLOAT to
  * noisy DOUBLE first), so float lists are quantized to fixed-point
  * BIGINT before serializing (`fp` / `sqlFp`); rounding is
  * half-away-from-zero in both engines and nulls are preserved.
  *
  * Only the query OUTPUT is serialized — the operators underneath still
  * produce real arrays, and their per-value semantics stay covered by the
  * ScalaTest specs (the reference's assert_eq idiom,
  * /root/reference/src/dask_awkward/lib/testutils.py:29-99).
  */
object Ser {

  /** Serialize an array of int/bool/string/struct elements. */
  def js(c: Column): Column = to_json(c)

  /** Quantize a float/double array to fixed-point longs; nulls kept. */
  def fp(c: Column, scale: Long = 1000000L): Column =
    transform(c, x => round(x.cast("double") * scale).cast("long"))

  /** Serialize a float/double array via fixed-point quantization. */
  def jsfp(c: Column, scale: Long = 1000000L): Column = js(fp(c, scale))

  // DuckDB mirrors, spliced into oracle SQL so both sides stay visibly
  // identical at the call site.
  def sqlJs(expr: String): String = s"to_json($expr)::VARCHAR"
  def sqlFp(expr: String, scale: Long = 1000000L): String =
    s"list_transform($expr, x -> CAST(round(CAST(x AS DOUBLE) * $scale) AS BIGINT))"
  def sqlJsFp(expr: String, scale: Long = 1000000L): String =
    sqlJs(sqlFp(expr, scale))
}
