package graft

import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Plan-shape regression gate (VERDICT r13 item 1): physical-plan node
  * budgets are the deterministic complement to bench_guard's wall-clock
  * comparison (which the doctrine documents as hostage to box weather).
  * Full gate = `runMain graft.PlanStats` + `tools/plan_guard.py` against
  * `tools/plan_budget.json` (all 243 queries, sf0.001); this spec keeps
  * two fast invariants inside `sbt test`:
  *   1. representative query shapes still fit their committed budgets;
  *   2. the gate MECHANISM catches a deliberately-degraded plan —
  *      removing a shuffle_hash hint (SMJ + sorts appear) is flagged.
  */
class PlanBudgetSpec extends SparkSpec {

  private lazy val budget: Map[String, Map[String, Int]] =
    JsonMethods.parse(new java.io.File("tools/plan_budget.json")) match {
      case JObject(qs) => qs.map { case (q, JObject(kinds)) =>
        q -> kinds.map { case (k, JInt(n)) => k -> n.toInt
                         case (k, v) => fail(s"bad budget $q.$k=$v") }.toMap
      case (q, v) => fail(s"bad budget entry $q=$v")
      }.toMap
      case other => fail(s"bad budget file: $other")
    }

  private val sfDir = "/root/testdata/sf0.001"

  test("representative queries stay within their committed plan budgets " +
    "(full 243-query gate: runMain graft.PlanStats + tools/plan_guard.py)") {
    // mixed bag: flagship agg, LSH fan-out, hinted self-join, IVF argmin,
    // digest dedup — enough surface that a rule/strategy change in the
    // optimizer extensions trips the in-suite gate, not just the tool
    val names = Seq("q01_agg_pricing", "q50_dedup_exact", "q52_lsh_pairs",
      "q88_rp_neardup", "q121_semdedup")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val exc = PlanStats.exceedances(PlanStats.shape(df), budget(n))
      assert(exc.isEmpty,
        s"$n exceeds plan budget: " +
          exc.map { case (k, g, b) => s"$k $g>budget $b" }.mkString(", "))
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
  }

  test("negative: a lost shuffle_hash hint (SMJ + sorts replacing SHJ) " +
    "exceeds the hinted plan's budget — the gate catches hint removal") {
    val thresholdBefore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = spark.range(1000).withColumn("k", col("id") % 100)
      val b = spark.range(1000).withColumn("k", col("id") % 100)
        .withColumn("w", col("id") * 2)
      val hinted = a.join(b.hint("shuffle_hash"), "k")
      val degraded = a.join(b, "k")
      val hintedBudget = PlanStats.shape(hinted)
      assert(hintedBudget.getOrElse("shj", 0) == 1 &&
        hintedBudget.getOrElse("smj", 0) == 0,
        s"hinted plan not SHJ-shaped: $hintedBudget")
      // self-consistency: a plan never exceeds its own shape
      assert(PlanStats.exceedances(hintedBudget, hintedBudget).isEmpty)
      val exc = PlanStats.exceedances(PlanStats.shape(degraded), hintedBudget)
      assert(exc.exists(_._1 == "smj") && exc.exists(_._1 == "sort"),
        s"hint removal not caught: $exc")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresholdBefore)
  }
}
