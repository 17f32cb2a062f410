package graft

import org.apache.spark.sql.functions._
import graft.functions.{ArrayOps, Behaviors}
import Behaviors._

/** Behavior/extension surface (reference tests/test_behavior.py) + the
  * late additions: gather, combinationsN, md5_prefix64 native expression. */
class BehaviorsSpec extends SparkSpec {
  import spark.implicits._

  test("Point behavior: distance and magnitude on struct columns") {
    val df = Seq((0L, (3.0, 4.0), (0.0, 0.0))).toDF("row_id", "p", "q")
      .select(col("row_id"),
        col("p").cast("struct<x:double,y:double>").as("p"),
        col("q").cast("struct<x:double,y:double>").as("q"))
    assert(eval1(df, col("p").magnitude) == Seq(5.0))
    assert(eval1(df, col("p").distance(col("q"))) == Seq(5.0))
  }

  test("behavior lifts into arrays (points fixture)") {
    val mags = eval1(pointsDF, col("points").magnitudes).map(seqOf)
    assert(mags(1) == Seq())                      // empty row
    val m0 = mags(0).map(_.asInstanceOf[Double])
    assert(math.abs(m0.head - math.sqrt(1 + 81)) < 1e-12)
  }

  test("withName carries record-name metadata") {
    val df = pointsDF.select(Behaviors.withName(col("points"), "Point"))
    assert(df.schema.fields.head.metadata.getString("graft.record_name")
      == "Point")
  }

  test("withParameter / enforceType / indexIn completeness ops") {
    import org.apache.spark.sql.types._
    val df = Seq((0L, Seq(1, 2), "b"), (1L, Seq(3), "z")).toDF("row_id", "xs", "s")
    val withP = df.select(graft.functions.Behaviors.withParameter(
      col("xs"), "units", "GeV"))
    assert(withP.schema.fields.head.metadata.getString("graft.param.units") == "GeV")
    assert(eval1(df, graft.functions.NestedOps.enforceType(col("xs"),
      ArrayType(DoubleType))).map(seqOf) == Seq(Seq(1.0, 2.0), Seq(3.0)))
    assert(eval1(df, graft.functions.StrOps.indexIn(col("s"), Seq("a", "b", "c")))
      == Seq(1L, null))
    // without_parameters (structure.py:1217-1231) strips every tag, keeps data
    val stripped = withP.select(graft.functions.Behaviors.withoutParameters(
      col("value"), as = "xs"))
    assert(stripped.schema.fields.head.metadata ==
      org.apache.spark.sql.types.Metadata.empty)
    assert(eval1(stripped.withColumn("row_id", monotonically_increasing_id()),
      col("xs")).map(seqOf) == Seq(Seq(1, 2), Seq(3)))
    // describe.fields (describe.py:9-24)
    assert(graft.api.awk.fields(df) == Seq("row_id", "xs", "s"))
    val rec = df.select(struct(col("row_id"), col("s")).as("r"))
    assert(graft.api.awk.fields(rec, "r") == Seq("row_id", "s"))
    assert(graft.api.awk.backend(df) == "spark")
  }

  test("gather: positive, negative, out-of-range indices") {
    val df = Seq((0L, Seq(10, 20, 30), Seq(2, 0, -1, 5))).toDF("row_id", "xs", "is")
    assert(eval1(df, ArrayOps.gather(col("xs"), col("is"))).map(seqOf) ==
      Seq(Seq(30, 10, 30, null)))
  }

  test("combinationsN: n=2 matches combinations2; n=3 correct") {
    val df = Seq((0L, Seq("a", "b", "c", "d"))).toDF("row_id", "xs")
    val c2 = eval1(df, ArrayOps.combinationsN(col("xs"), 2)).map(seqOf).head
      .map(seqOf)
    assert(c2 == Seq(Seq("a", "b"), Seq("a", "c"), Seq("a", "d"),
      Seq("b", "c"), Seq("b", "d"), Seq("c", "d")))
    val c3 = eval1(df, ArrayOps.combinationsN(col("xs"), 3)).map(seqOf).head
      .map(seqOf)
    assert(c3 == Seq(Seq("a", "b", "c"), Seq("a", "b", "d"),
      Seq("a", "c", "d"), Seq("b", "c", "d")))
  }

  test("md5_prefix64 native expression matches conv(substring(md5)) and codegens") {
    val df = Seq((0L, "hello"), (1L, "spark engine"), (2L, ""))
      .toDF("row_id", "s")
    val native = eval1(df, call_function("md5_prefix64", col("s")))
    val composed = eval1(df,
      conv(substring(md5(col("s")), 1, 8), 16, 10).cast("long"))
    assert(native == composed)
  }

  test("min_md5_hex / min_shingle_md5_hex match the composed HOF forms") {
    val df = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "a b"), // fewer than 3 words -> null shingle fingerprint
      (2L, "solo"),
      (3L, "x y z"),
      (4L, "")).toDF("row_id", "text")
      .select(col("row_id"), split(col("text"), " ").as("ws"))
    val nativeW = eval1(df, call_function("min_md5_hex", col("ws")))
    val composedW = eval1(df, array_min(transform(col("ws"), w => md5(w))))
    assert(nativeW == composedW)
    val nativeS = eval1(df,
      call_function("min_shingle_md5_hex", col("ws"), lit(3)))
    val composedS = eval1(df, array_min(transform(
      graft.functions.TextOps.shingles(col("ws"), 3), sh => md5(sh))))
    assert(nativeS == composedS)
    assert(nativeS(1) == null && nativeS(2) == null)
    // null element: skipped by the word form, nulls its windows in the
    // shingle form
    val dfn = Seq(0L).toDF("row_id")
      .select(col("row_id"),
        array(lit("a"), lit(null).cast("string"), lit("b")).as("ws"))
    assert(eval1(dfn, call_function("min_md5_hex", col("ws"))) ==
      eval1(dfn, array_min(transform(col("ws"), w => md5(w)))))
    assert(eval1(dfn,
      call_function("min_shingle_md5_hex", col("ws"), lit(3))) == Seq(null))
  }

  test("prefix_offsets is SQL-callable (registered via GraftExtensions)") {
    val df = Seq((0L, Seq(2, 3, 1))).toDF("row_id", "counts")
    assert(eval1(df, call_function("prefix_offsets", col("counts")))
      .map(seqOf) == Seq(Seq(0L, 2L, 5L, 6L)))
  }
}
