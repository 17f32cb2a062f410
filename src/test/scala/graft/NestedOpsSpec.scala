package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.NestedOps

/** Schema-recursive expression builder over the deep F3-style fixture
  * (reference unnamed_root_ds, lib/testutils.py:187-229: three levels of
  * list-of-struct-of-list). */
class NestedOpsSpec extends SparkSpec {
  import spark.implicits._
  import NestedFixture._

  private def deepDF = Seq(
    (0L, Seq(
      Entry(90, Passes(Seq(1, 2), Seq(true, false)), Seq(Assist(10.5, 7))),
      Entry(45, Passes(Seq(), Seq()), Seq()))),
    (1L, Seq[Entry]()))
    .toDF("row_id", "value")

  test("mapLeaves doubles every numeric leaf through 3 nesting levels") {
    val dt = deepDF.schema("value").dataType
    val doubled = NestedOps.mapLeaves(col("value"), dt) {
      case (c, LongType) => c * 2
      case (c, DoubleType) => c * 2.0
      case (c, _) => c
    }
    val row = deepDF.orderBy("row_id").select(doubled.as("v")).head()
    val entries = row.getSeq[org.apache.spark.sql.Row](0)
    assert(entries(0).getLong(0) == 180)                       // minutes*2
    val passes = entries(0).getStruct(1)
    assert(passes.getSeq[Long](0) == Seq(2L, 4L))              // to*2
    assert(passes.getSeq[Boolean](1) == Seq(true, false))      // untouched
    val assists = entries(0).getSeq[org.apache.spark.sql.Row](2)
    assert(assists(0).getDouble(0) == 21.0 && assists(0).getLong(1) == 14)
  }

  test("valuesAstype casts all leaves") {
    val df = Seq((0L, Seq(Seq(1, 2), Seq(3)))).toDF("row_id", "v")
    val dt = df.schema("v").dataType
    val casted = NestedOps.valuesAstype(col("v"), dt, DoubleType)
    val got = df.select(casted.as("v")).head().getSeq[Seq[Double]](0)
    assert(got == Seq(Seq(1.0, 2.0), Seq(3.0)))
  }

  test("zipLeaves combines structurally-identical nested columns") {
    val df = Seq((0L, Seq(1.0, 2.0), Seq(10.0, 20.0))).toDF("row_id", "a", "b")
    val dt = df.schema("a").dataType
    val sum = NestedOps.zipLeaves(col("a"), col("b"), dt)(_ + _)
    assert(eval1(df, sum).map(seqOf) == Seq(Seq(11.0, 22.0)))
  }

  test("broadcastScalar adds a scalar deep inside nesting") {
    val df = Seq((0L, Seq(Seq(1.0), Seq(2.0, 3.0)))).toDF("row_id", "v")
    val dt = df.schema("v").dataType
    val plus = NestedOps.broadcastScalar(col("v"), dt, lit(100.0))(_ + _)
    assert(eval1(df, plus).map(seqOf).map(_.map(seqOf)) ==
      Seq(Seq(Seq(101.0), Seq(102.0, 103.0))))
  }

  test("fullLike fills leaves with a constant") {
    val df = Seq((0L, Seq(1, 2, 3))).toDF("row_id", "v")
    val dt = df.schema("v").dataType
    assert(eval1(df, NestedOps.fullLike(col("v"), dt, lit(9))).map(seqOf) ==
      Seq(Seq(9, 9, 9)))
  }
}

/** F3 fixture case classes (top-level so Spark can generate encoders). */
object NestedFixture {
  case class Passes(to: Seq[Long], success: Seq[Boolean])
  case class Assist(distance: Double, scorer: Long)
  case class Entry(minutes: Long, passes: Passes, assists: Seq[Assist])
}
