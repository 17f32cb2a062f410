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
    assert(eval1(df, awk.num(awk.argcombinations(col("xs"), 2))) == Seq(3))
  }

  test("list-form cartesian and named-field combinations (structure.py:245-332)") {
    val df = Seq((0L, Seq(1, 2), Seq(10), Seq(100, 200))).toDF("row_id", "a", "b", "c")
    assert(eval1(df, awk.num(awk.cartesian(Seq(col("a"), col("b"), col("c"))))) ==
      Seq(4))
    assert(eval1(df, awk.num(awk.argcartesian(Seq(col("a"), col("c"))))) == Seq(4))
    val named = eval1(df.select(col("row_id"),
        awk.combinations(col("c"), 2, fields = Seq("x", "y")).as("p")),
      col("p")).map(seqOf).head
    val r = named.head.asInstanceOf[org.apache.spark.sql.Row]
    assert(r.schema.fieldNames.toSeq == Seq("x", "y"))
    // n>2 with fields routes through combinationsNamed
    val dfw = Seq((0L, Seq("a", "b", "c"))).toDF("row_id", "xs")
    val t = eval1(dfw, awk.combinations(col("xs"), 3, fields = Seq("p", "q", "r")))
      .map(seqOf).head.head.asInstanceOf[org.apache.spark.sql.Row]
    assert(t.schema.fieldNames.toSeq == Seq("p", "q", "r"))
  }

  test("sample: factor and probability modes (inspect.py:241-273)") {
    val df = (0L until 1000L).map(i => (i, s"doc$i")).toDF("id", "t")
    val byFactor = awk.sample(df, col("id"), factor = 10)
    assert(byFactor.count() == 100)
    val byProb = awk.sample(df, col("id"), probability = 0.2)
    val n = byProb.count()
    assert(n > 120 && n < 280, s"p=0.2 of 1000 kept $n")
    // determinism: same rows survive on a repartitioned input
    val again = awk.sample(df.repartition(7), col("id"), probability = 0.2)
    assert(again.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      byProb.select("id").collect().map(_.getLong(0)).sorted.toSeq)
    intercept[IllegalArgumentException] {
      awk.sample(df, col("id"), factor = 2, probability = 0.5)
    }
  }
}
