package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components — the step that turns near-duplicate
  * PAIRS (LSH / cosine candidates) into duplicate GROUPS, i.e. the tail of
  * every dedup pipeline: label each doc with its group's canonical (min)
  * id, keep one representative per group.
  *
  * Min-label propagation, Pregel-style: every node starts labeled with its
  * own id; each round takes the min of its own and its neighbors' labels;
  * stop when the global label sum stops falling (labels only decrease, so
  * equal sum == fixpoint — an O(1)-row action per round, no row-level
  * diff). Rounds needed = max BFS distance from a component's min node —
  * for LSH graphs (overlapping near-cliques) a handful; a 100 TB variant
  * would add large-star/small-star contraction for O(log n) rounds, same
  * per-round join shape. Each round is one shuffle join + partial-agg min;
  * intermediate labels persist and the previous round unpersists, so
  * memory stays one label table.
  *
  * Measured and rejected: disabling AQE for the loop (3.7x SLOWER — AQE's
  * shuffle-partition coalescing is what keeps the tiny per-round shuffles
  * from fanning out to full-width task waves), and an f³ pointer
  * composition (saves ~1 round on chain-like graphs, pays a join every
  * round).
  */
object GraphOps {

  /** edges: DataFrame with two integral id columns; returns (id, label)
    * with label = min id reachable. Isolated nodes (absent from edges) are
    * absent from the output — union them in upstream if needed. */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 50): DataFrame = {
    val und = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .union(edges.select(col(dstCol).cast("long").as("src"),
        col(srcCol).cast("long").as("dst")))
      .persist()
    // localCheckpoint (eager), NOT persist: each round's plan references
    // the previous labels twice (union + join), so lineage doubles per
    // round — by round ~10 the planner itself OOMs. Checkpointing cuts the
    // plan to a LogicalRDD of constant size; superseded checkpoint blocks
    // are reclaimed by the ContextCleaner when the DataFrame is GC'd.
    // Init folds the FIRST neighbor-propagation step into the node-set
    // aggregation (min over self + direct neighbors), saving one round.
    var labels = und.groupBy(col("src").as("id"))
      .agg(least(min(col("src")), min(col("dst"))).as("lbl"))
      .localCheckpoint(true)
    var sum = labels.agg(org.apache.spark.sql.functions.sum("lbl"))
      .head.getLong(0)
    var i = 0
    var converged = false
    val debug = sys.env.contains("GRAFT_CC_DEBUG")
    var tPrev = System.nanoTime()
    while (!converged && i < maxIter) {
      if (debug) {
        println(f"[cc] round $i start at ${(System.nanoTime()-tPrev)/1e9}%.2f s")
        tPrev = System.nanoTime()
      }
      val nbr = und.join(labels.select(col("id").as("dst"), col("lbl")), "dst")
        .select(col("src").as("id"), col("lbl"))
      // pointer jumping: also take the label OF the previous label (every
      // label is itself a node id, so the inner self-join is total —
      // self-joining `labels` is safe because it is a checkpointed
      // LogicalRDD, not a shared live subtree, which would trip Catalyst's
      // self-join attribute dedup). Distance-to-min divides by ~3 per
      // round (neighbor step + doubled pointer) — O(log d) rounds — for
      // one extra equi-join. A deeper f³ composition was measured and
      // reverted: on the chain-like rp graph it saved ~1 round but paid a
      // join in every round.
      val jump = labels
        .join(labels.toDF("jid", "jlbl"), col("lbl") === col("jid"))
        .select(col("id"), col("jlbl").as("lbl"))
      val updated = labels.union(nbr).union(jump)
        .groupBy("id").agg(min("lbl").as("lbl"))
        .localCheckpoint(true)
      val newSum = updated.agg(org.apache.spark.sql.functions.sum("lbl"))
        .head.getLong(0)
      labels = updated
      converged = newSum == sum
      sum = newSum
      i += 1
    }
    und.unpersist()
    labels
  }

  /** Connected components by alternating LARGE-STAR / SMALL-STAR
    * contraction (Kiveris et al., "Connected Components in MapReduce and
    * Beyond") — the shape for graphs where min-label propagation's
    * per-round O(E) join is too heavy: each round REWRITES the edge set
    * toward a star (every node pointing at its component min), so the
    * working set contracts as components collapse, and high-degree hubs
    * are broken up instead of re-joined every round.
    *
    *  - large-star: per node u over its full neighborhood, connect every
    *    LARGER neighbor to m = min(N(u) ∪ u).
    *  - small-star: per node u over its smaller neighbors, connect u and
    *    all of them to their minimum.
    *
    * Rounds are two groupBy-join stages over a shrinking, deduped
    * (max, min) edge list, checkpointed like the propagation loop.
    * Convergence = edge-set fixpoint, detected by (count, xxhash64-sum)
    * — a deterministic O(1)-row action per round. Returns the same
    * (id, lbl) shape as [[connectedComponents]]. */
  def connectedComponentsContract(edges: DataFrame, srcCol: String,
      dstCol: String, maxIter: Int = 50): DataFrame = {
    def canon(df: DataFrame): DataFrame =
      df.filter(col("a") =!= col("b"))
        .select(greatest(col("a"), col("b")).as("a"),
          least(col("a"), col("b")).as("b"))
        .distinct()
    def fp(df: DataFrame): (Long, Long) = {
      // bit_xor: order-independent and overflow-free (an ANSI sum of
      // xxhash64 values overflows long)
      val r = df.agg(count(lit(1)),
        expr("bit_xor(xxhash64(a, b))")).head
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    val raw = edges.select(col(srcCol).cast("long").as("a"),
      col(dstCol).cast("long").as("b"))
    // node set captured BEFORE canon(): a node appearing only in
    // self-loop edges would otherwise vanish with the dropped (x, x) rows
    // and diverge from connectedComponents, which keeps it
    val nodes = raw.select(col("a").as("id"))
      .union(raw.select(col("b").as("id"))).distinct().persist()
    var e = canon(raw).localCheckpoint(true)
    var sig = fp(e)
    var i = 0
    var converged = false
    while (!converged && i < maxIter) {
      // large-star over the symmetrized neighborhood
      val sym = e.union(e.select(col("b").as("a"), col("a").as("b")))
      val lsm = sym.groupBy("a")
        .agg(least(min(col("b")), min(col("a"))).as("m"))
      // (x, m) for every neighbor x > u; x > u >= m, so already (max, min)
      val ls = sym.join(lsm, "a").filter(col("b") > col("a"))
        .select(col("b").as("a"), col("m").as("b"))
        .distinct().localCheckpoint(true)
      // small-star: edges are (big, small); connect u and all its smaller
      // neighbors to their min
      val ssm = ls.groupBy("a").agg(min(col("b")).as("m"))
      val withM = ls.join(ssm, "a")
      val ss = withM.select(col("a"), col("m").as("b"))
        .union(withM.filter(col("b") =!= col("m"))
          .select(col("b").as("a"), col("m").as("b")))
      e = canon(ss).localCheckpoint(true)
      val newSig = fp(e)
      converged = newSig == sig
      sig = newSig
      i += 1
    }
    // fixpoint is a star: every edge is (node, component-min); min nodes
    // label themselves. groupBy-min guards the (impossible at fixpoint,
    // cheap anyway) case of residual multi-edges. The nodes left join
    // restores self-loop-only nodes as their own singleton components.
    val star = e.select(col("a").as("id"), col("b").as("lbl"))
      .union(e.select(col("b").as("id"), col("b").as("lbl")))
      .groupBy("id").agg(min("lbl").as("lbl"))
    val out = nodes.join(star, Seq("id"), "left")
      .select(col("id"), coalesce(col("lbl"), col("id")).as("lbl"))
    nodes.unpersist()
    out
  }
}
