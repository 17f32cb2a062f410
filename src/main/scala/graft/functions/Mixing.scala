package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Temperature-based data mixing (q124 + the q125 composed pipeline) —
  * the multinomial source-reweighting step of pretraining mixes, α = 0.5.
  * One home for the constants and both stages so the standalone query and
  * the pipeline cannot drift (the piiRedact treatment).
  *
  * Everything is integer for cross-engine exactness: weights are
  * floor(sqrt(n)) — sqrt is IEEE exactly-rounded so both engines floor
  * the identical double — summed as BIGINTs (a direct Σ sqrt(n) would be
  * double-sum-order dependent), and targets are (budget·w) div z.
  * Selection is RANK-FREE: a per-group integer hash threshold picks rows
  * in one map stage (binomially close to target, no per-stratum sort
  * reducer); hash < 1e9, so hash·n and target·M stay under 2^63 up to
  * ~10^9 rows per group.
  */
object Mixing {
  val HashMul = 2654435761L
  val HashMod = 1000000007L

  /** Append integer sqrt-temperature targets (half-corpus budget) to a
    * per-group count table `counts(…, n)`. */
  def sqrtTargets(counts: DataFrame): DataFrame = {
    val w = counts.withColumn("wt",
      floor(sqrt(col("n").cast("double"))).cast("long"))
    val tot = w.agg(sum("wt").as("z"), sum("n").as("ntot"))
    w.crossJoin(broadcast(tot))
      .select(counts.columns.map(col) :+
        expr("(ntot div 2) * wt div z").as("target"): _*)
  }

  /** The rank-free pick predicate: `hash(id)·n < target·M`. The id is
    * reduced mod M BEFORE the multiply (identity for id < M ≈ 1e9, i.e.
    * every gate SF — outputs unchanged) so the product stays ≤ (M−1)·mul
    * ≈ 2.65e18 < 2^63 for ANY id: replica corpora offset ids past 3.5e9,
    * where the unreduced form overflows (ANSI errors loudly; caught by
    * the r11 1000x q225 run). Every oracle mirrors the same order. */
  def hashPicked(id: Column, n: Column, target: Column): Column =
    (id % HashMod) * HashMul % HashMod * n < target * HashMod
}
