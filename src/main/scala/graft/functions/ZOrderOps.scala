package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering keys with DATA-DERIVED bit widths.
  *
  * A fixed 16-bit interleave is the adaptive-constant trap (the `% 256`
  * band-key / fixed-RP-plane failure mode): ids >= 2^16 alias mod 2^16
  * and a curve bucket stops bounding the aliased dimension — exactly at
  * the replica scales where locality matters. Widths are therefore
  * derived from the data (`wa`/`wb` = bit length of each column's max,
  * floored at 16 so every gate SF reproduces the historical 16/16 key
  * byte-identically) and the two dimensions may be UNEQUAL: bit k of
  * column A lands at position 2k while both dims are interleaving
  * (k < min) and at position k + wOther once the shorter dim is
  * exhausted. Total width wa + wb must stay <= 63 (int64): the caller
  * caps the id-like dimension at 63 − wa.
  *
  * The locality guarantee is width-independent: dropping the low 12
  * interleaved bits (bucket = zval div 4096) fixes both dims' bits >= 6,
  * so per-bucket spread < 64 in EACH dimension at any corpus size.
  */
object ZOrderOps {

  /** Bit length of a column's max as a 1-row scalar: greatest(16,
    * length(bin(max(c)))) — integer-exact and identical in DuckDB
    * (`greatest(16, length(bin(max(c))))`). */
  def widthExpr(c: String): Column =
    greatest(lit(16), length(bin(max(col(c)).cast("long"))))

  /** The interleave expression (SQL-string form so the identical text
    * documents the DuckDB mirror): columns `a`, `b` and scalar width
    * columns `wa`, `wb` must be in scope. */
  def zvalSql(a: String, b: String, wa: String, wb: String): String =
    s"""aggregate(sequence(0, greatest($wa, $wb) - 1), 0L, (acc, k) ->
       |  acc
       |  + (CASE WHEN k < $wa THEN (($a div shiftleft(1L, k)) % 2)
       |       * shiftleft(1L, CASE WHEN k < $wb THEN 2 * k
       |                        ELSE k + $wb END)
       |     ELSE 0L END)
       |  + (CASE WHEN k < $wb THEN (($b div shiftleft(1L, k)) % 2)
       |       * shiftleft(1L, CASE WHEN k < $wa THEN 2 * k + 1
       |                        ELSE k + $wa END)
       |     ELSE 0L END))""".stripMargin
}
