package graft

import org.apache.spark.sql.functions.{col, lit}
import graft.api.awk

/** The façade speaks the reference's vocabulary end-to-end: the docs'
  * canonical example (docs/more/optimization.rst: project nested field ->
  * per-row reduction -> global reduction) written in `awk.*` terms. */
class AwkFacadeSpec extends SparkSpec {
  import spark.implicits._

  test("canonical example: nested projection -> per-row sum -> global sum") {
    val ds = pointsDF   // array<struct<x,y>> jagged rows
    val perRow = ds.select(col("row_id"),
      awk.sum(col("points.x")).as("sx"),
      awk.num(col("points")).as("n"))
    assert(eval1(perRow, col("sx")) == Seq(6.0, 0.0, 9.0, 6.0, 24.0))
    val total = perRow.agg(org.apache.spark.sql.functions.sum("sx")).head.getDouble(0)
    assert(total == 45.0)
  }

  test("structure vocabulary round-trips") {
    val df = Seq((0L, Seq(3.0, 1.0, 2.0))).toDF("row_id", "xs")
    assert(eval1(df, awk.sort(col("xs"))).map(seqOf) == Seq(Seq(1.0, 2.0, 3.0)))
    assert(eval1(df, awk.argmax(col("xs"))) == Seq(0))
    assert(eval1(df, awk.num(awk.combinations(col("xs"), 2))) == Seq(3))
    assert(eval1(df, awk.firsts(awk.run_lengths(col("xs")))) == Seq(1L))
    assert(eval1(df, awk.str.upperStr(lit("ab"))) == Seq("AB"))
  }
}
