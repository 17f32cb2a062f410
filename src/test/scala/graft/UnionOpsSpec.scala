package graft

import org.apache.spark.sql.functions._
import graft.functions.UnionOps._

/** Tagged-union encoding (reference UnionForm — SURVEY §7.4's known-hard
  * mismatch; encoded as struct<tag, v0.., v1..>). */
class UnionOpsSpec extends SparkSpec {
  import spark.implicits._

  test("makeUnion stores exactly the active variant; matchUnion eliminates") {
    val df = Seq((0L, 0, 42, "x"), (1L, 1, 7, "hello"), (2L, 0, -1, "y"))
      .toDF("row_id", "tag", "iv", "sv")
    val u = makeUnion(col("tag"),
      Seq("as_int" -> col("iv"), "as_str" -> col("sv")))
    val made = df.select(col("row_id"), u.as("u")).orderBy("row_id")

    // exactly one variant non-null
    val rows = made.select(col("u.tag"), col("u.as_int"), col("u.as_str"))
      .collect()
    assert(rows(0).getInt(0) == 0 && rows(0).getInt(1) == 42 && rows(0).isNullAt(2))
    assert(rows(1).getInt(0) == 1 && rows(1).isNullAt(1) && rows(1).getString(2) == "hello")

    // eliminator: render either variant to a string
    val rendered = made.select(matchUnion(col("u"), Seq(
      "as_int" -> ((v: org.apache.spark.sql.Column) => concat(lit("int:"), v)),
      "as_str" -> ((v: org.apache.spark.sql.Column) => concat(lit("str:"), v))))
      .as("r")).collect().map(_.getString(0))
    assert(rendered.toSeq == Seq("int:42", "str:hello", "int:-1"))
  }

  test("unions nest inside arrays (jagged union lists)") {
    val df = Seq((0L, Seq(0, 1, 0), Seq(1, 2, 3))).toDF("row_id", "tags", "vals")
    val arr = zip_with(col("tags"), col("vals"), (t, v) =>
      makeUnion(t, Seq("n" -> v, "s" -> concat(lit("#"), v.cast("string")))))
    val got = df.select(arr.as("a")).head().getSeq[org.apache.spark.sql.Row](0)
    assert(got(0).getInt(1) == 1 && got(0).isNullAt(2))   // tag 0 -> n
    assert(got(1).isNullAt(1) && got(1).getString(2) == "#2") // tag 1 -> s
  }
}
