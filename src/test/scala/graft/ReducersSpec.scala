package graft

import org.apache.spark.sql.functions._
import graft.functions.Reducers._

/** Per-row and global reducer tests (reference tests/test_reducers.py),
  * including the ops the reference stubs as TODO. */
class ReducersSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (0L, Seq(1.0, 2.0, 3.0, 4.0)),
    (1L, Seq(-1.0, 1.0)),
    (2L, Seq(5.0))).toDF("row_id", "xs")

  test("sum/prod/min/max/count per row") {
    assert(eval1(df, sumArr(col("xs"))) == Seq(10.0, 0.0, 5.0))
    assert(eval1(df, prodArr(col("xs"))) == Seq(24.0, -1.0, 5.0))
    assert(eval1(df, minArr(col("xs"))) == Seq(1.0, -1.0, 5.0))
    assert(eval1(df, maxArr(col("xs"))) == Seq(4.0, 1.0, 5.0))
    assert(eval1(df, countArr(col("xs"))) == Seq(4, 2, 1))
  }

  test("countNonzero / any / all") {
    val z = Seq((0L, Seq(0.0, 1.0, 0.0, 2.0))).toDF("row_id", "xs")
    assert(eval1(z, countNonzeroArr(col("xs"))) == Seq(2))
    assert(eval1(df, anyArr(col("xs"), _ > 3)) == Seq(true, false, true))
    assert(eval1(df, allArr(col("xs"), _ > 0)) == Seq(true, false, true))
  }

  test("argmin/argmax first occurrence") {
    val d2 = Seq((0L, Seq(3.0, 1.0, 1.0, 9.0, 9.0))).toDF("row_id", "xs")
    assert(eval1(d2, argminArr(col("xs"))) == Seq(1))
    assert(eval1(d2, argmaxArr(col("xs"))) == Seq(3))
  }

  test("mean/var/std/ptp per row") {
    assert(eval1(df, meanArr(col("xs"))) == Seq(2.5, 0.0, 5.0))
    assert(eval1(df, varArr(col("xs"))) == Seq(1.25, 1.0, 0.0))
    val sd = eval1(df, stdArr(col("xs"))).map(_.asInstanceOf[Double])
    assert(math.abs(sd.head - math.sqrt(1.25)) < 1e-12)
    assert(eval1(df, ptpArr(col("xs"))) == Seq(3.0, 2.0, 0.0))
  }

  test("varArr ddof=1 (sample variance); null when dof exhausted") {
    val got = eval1(df, varArr(col("xs"), ddof = 1))
    assert(math.abs(got(0).asInstanceOf[Double] - 5.0 / 3) < 1e-12)
    assert(math.abs(got(1).asInstanceOf[Double] - 2.0) < 1e-12)
    assert(got(2) == null)  // single element, ddof=1
  }

  test("softmax sums to 1") {
    val got = eval1(df, softmaxArr(col("xs"))).map(seqOf)
    got.foreach { soft =>
      val total = soft.map(_.asInstanceOf[Double]).sum
      assert(math.abs(total - 1.0) < 1e-12)
    }
  }

  test("momentArr third central moment") {
    val got = eval1(df, momentArr(col("xs"), 3)).map(_.asInstanceOf[Double])
    // xs=(1,2,3,4): symmetric about 2.5 -> 0
    assert(math.abs(got(0)) < 1e-12)
  }

  test("mask_identity and keepdims flags") {
    val d = Seq((0L, Seq(1.0, 2.0)), (1L, Seq[Double]())).toDF("row_id", "xs")
    // default: empty list reduces to the identity (0.0)
    assert(eval1(d, sumArr(col("xs"))) == Seq(3.0, 0.0))
    // mask_identity: empty -> null
    assert(eval1(d, withFlags(col("xs"), sumArr(col("xs")),
      maskIdentity = true)) == Seq(3.0, null))
    // keepdims: wrap in length-1 list
    assert(eval1(d, withFlags(col("xs"), sumArr(col("xs")),
      keepdims = true)).map(seqOf) == Seq(Seq(3.0), Seq(0.0)))
  }

  test("global stats are native aggregates") {
    val flat = df.select(explode(col("xs")).as("x"))
      .withColumn("y", col("x") * 2 + 1)
    val row = flat.agg(
      corrGlobal(col("x"), col("y")).as("c"),
      covarGlobal(col("x"), col("y")).as("cv"),
      linearFitSlope(col("x"), col("y")).as("sl"),
      linearFitIntercept(col("x"), col("y")).as("ic")).head()
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-12)  // perfectly linear
    assert(math.abs(row.getDouble(2) - 2.0) < 1e-12)  // slope 2
    assert(math.abs(row.getDouble(3) - 1.0) < 1e-12)  // intercept 1
  }
}
