package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregations — the reference's `non_trivial_reduction(
  * reducer=, combiner=)` extension point (core.py:2349-2457) as Spark
  * `Aggregator`s: the reduce/merge/finish trio IS the chunk/combine/
  * finalize trio of the reference's tree reduction, executed by Spark's
  * partial+final aggregation instead of a hand-built layer.
  */
object Aggregators {

  /** Weighted mean with exact partial merging. */
  final case class WSum(sum: Double, weight: Double)
  object WeightedMean extends Aggregator[(Double, Double), WSum, Double] {
    override def zero: WSum = WSum(0.0, 0.0)
    override def reduce(b: WSum, a: (Double, Double)): WSum =
      WSum(b.sum + a._1 * a._2, b.weight + a._2)
    override def merge(x: WSum, y: WSum): WSum =
      WSum(x.sum + y.sum, x.weight + y.weight)
    override def finish(r: WSum): Double =
      if (r.weight == 0) Double.NaN else r.sum / r.weight
    override def bufferEncoder: Encoder[WSum] = Encoders.product[WSum]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Bounded k-minima in one pass (the MinHash-signature shape: state is k
    * longs regardless of input size — O(k) memory, associative merge). */
  final case class MinK(k: Int, vals: List[Long]) {
    def add(v: Long): MinK = {
      val nv = (v :: vals).sorted.take(k)
      copy(vals = nv)
    }
    def ++(o: MinK): MinK = copy(vals = (vals ++ o.vals).sorted.take(k))
  }

  /** r15 mutable MinK buffer: the immutable `MinK` above (kept as the
    * executable reference — Round15LawsSpec's differential pins multiset
    * equality) allocated and SORTED a (k+1)-element list per input row
    * — ~20 query sites pay that on corpus-scale streams (k up to 128 in
    * q240). This is the classic bounded max-heap over the k smallest:
    * O(log k) in-place on the rare improving row, O(1) rejection on the
    * common row, zero allocation. Duplicates are kept, exactly like
    * sorted.take(k); finish sorts ascending once per group. */
  final case class MinKH(k: Int, heap: Array[Long], var n: Int) {
    def add(v: Long): Unit = {
      if (n < k) {
        heap(n) = v
        n += 1
        var i = n - 1
        while (i > 0 && heap((i - 1) / 2) < heap(i)) {
          val p = (i - 1) / 2
          val t = heap(p); heap(p) = heap(i); heap(i) = t
          i = p
        }
      } else if (k > 0 && v < heap(0)) {
        heap(0) = v
        var i = 0
        var done = false
        while (!done) {
          val l = 2 * i + 1
          val r = l + 1
          var m = i
          if (l < n && heap(l) > heap(m)) m = l
          if (r < n && heap(r) > heap(m)) m = r
          if (m == i) done = true
          else { val t = heap(m); heap(m) = heap(i); heap(i) = t; i = m }
        }
      }
    }
    def mergeIn(o: MinKH): MinKH = {
      var i = 0
      while (i < o.n) { add(o.heap(i)); i += 1 }
      this
    }
    def sortedVals: Seq[Long] = {
      val a = java.util.Arrays.copyOf(heap, n)
      java.util.Arrays.sort(a)
      scala.collection.immutable.ArraySeq.unsafeWrapArray(a)
    }
  }
  final class MinKAgg(k: Int) extends Aggregator[Long, MinKH, Seq[Long]] {
    override def zero: MinKH = MinKH(k, new Array[Long](k), 0)
    override def reduce(b: MinKH, a: Long): MinKH = { b.add(a); b }
    override def merge(x: MinKH, y: MinKH): MinKH = x.mergeIn(y)
    override def finish(r: MinKH): Seq[Long] = r.sortedVals
    override def bufferEncoder: Encoder[MinKH] = Encoders.product[MinKH]
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Single-pass argmin: the (value at lexicographic-min (dist, value))
    * aggregation that k-means-assign / IVF probes need. Replaces the
    * q100/q121 two-hash-agg argmin (min dist, join back, min value at
    * that dist) — which evaluates its CANDIDATE SET twice (the r12
    * verdict's last acknowledged double-eval) — with one ObjectHashAgg
    * over a 17-byte buffer, so the broadcast-seed crossJoin is computed
    * exactly once. Never min_by/min(struct): struct-typed declarative
    * buffers force SortAggregate over the full n·k candidate stream.
    *
    * Tie-break matches the oracle's `row_number() ORDER BY dist, id`:
    * smaller value wins at equal dist. Primitive `<`/`==` compares are
    * exact here — dist is never NaN (finite inputs) and never -0.0
    * (it is `(vv - 2·dot) + cc` with vv,cc ≥ 0: IEEE a-b and a+b yield
    * -0.0 only from -0.0 operands), and primitive -0.0 == 0.0 equals
    * SQL's equality semantics anyway.
    *
    * ==== CONTRACT (r13 verdict + ADVICE pin) — every caller MUST hold ====
    *  1. `dist` is never NaN. NaN poisons the fold ORDER-DEPENDENTLY:
    *     a NaN adopted into an empty buffer beats every later finite
    *     row (both `<` and `==` are false against NaN), while a NaN
    *     arriving after a finite row loses — the result then depends
    *     on partition layout. AggregatorsSpec pins this divergence as
    *     a negative law. A future SUBTRACTIVE distance (a−b with no
    *     nonneg-square argument) must pre-filter `isnan(dist)` or map
    *     NaN→+Inf before the agg.
    *  2. `dist` is never -0.0 at a tie with +0.0 UNLESS bit-equality is
    *     irrelevant: primitive == treats them equal (SQL semantics), so
    *     ties at zero still break purely on id — this one is safe by
    *     IEEE for the (vv − 2·dot) + cc call sites and proven in spec.
    *  3. Inputs are NON-NULL. The old min()/join-back form silently
    *     ignored NULL dist/value rows; this udaf's (Double, Long)
    *     ExpressionEncoder is non-nullable and THROWS at runtime on a
    *     null (e.g. a null embedding producing a null dot product) —
    *     a data regression fails loudly instead of shifting the
    *     argmin. Callers over possibly-null columns must filter
    *     `isnull` first (all current call sites scan non-null
    *     embedding/centroid arrays). */
  final case class AM(dist: Double, v: Long, set: Boolean)
  object ArgMinAgg extends Aggregator[(Double, Long), AM, Long] {
    override def zero: AM = AM(Double.PositiveInfinity, Long.MaxValue, false)
    private def better(d: Double, v: Long, b: AM): Boolean =
      !b.set || d < b.dist || (d == b.dist && v < b.v)
    override def reduce(b: AM, a: (Double, Long)): AM =
      if (better(a._1, a._2, b)) AM(a._1, a._2, set = true) else b
    override def merge(x: AM, y: AM): AM =
      if (y.set && better(y.dist, y.v, x)) y else x
    override def finish(r: AM): Long = r.v
    override def bufferEncoder: Encoder[AM] = Encoders.product[AM]
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Misra–Gries heavy-hitters sketch: at most k counters, O(k) state per
    * partial regardless of input size. Deterministic guarantee (no
    * randomness, unlike count-min): every item with true frequency
    * > n/(k+1) survives, and each reported count c satisfies
    * true − n/(k+1) <= c <= true. The merge is Agarwal et al.'s
    * mergeable-summaries rule — sum counters, then subtract the
    * (k+1)-largest value and drop non-positives — which preserves the
    * same bound under ANY partial-aggregation tree, so Spark's map-side
    * combine + final merge costs one O(k) state per task and one O(k)
    * row per shuffle. The vocabulary-heavy-hitters shape (what terms
    * dominate a 100 TB corpus) without q95's full term-keyed shuffle.
    */
  final case class MG(k: Int, counts: Map[String, Long]) {
    def add(item: String, w: Long): MG =
      counts.get(item) match {
        case Some(c) => copy(counts = counts.updated(item, c + w))
        case None if counts.size < k =>
          copy(counts = counts.updated(item, w))
        case None =>
          // decrement-all by the incoming weight, capped at the current
          // min (the classic "cancel one occurrence of everything")
          val d = math.min(w, counts.values.min)
          val dec = counts.view.mapValues(_ - d).filter(_._2 > 0).toMap
          val rest = w - d
          if (rest > 0) MG(k, dec).add(item, rest)
          else copy(counts = dec)
      }
    def ++(o: MG): MG = {
      val sum = o.counts.foldLeft(counts) { case (m, (i, c)) =>
        m.updated(i, m.getOrElse(i, 0L) + c)
      }
      if (sum.size <= k) copy(counts = sum)
      else {
        val d = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
        copy(counts = sum.view.mapValues(_ - d).filter(_._2 > 0).toMap)
      }
    }
  }
  /** r15 mutable MG buffer: the immutable-Map `MG` above (kept as the
    * executable reference — the Round15LawsSpec differential pins
    * equivalence) rebuilt a 64-entry map PER MISSING ITEM (two O(k)
    * traversals + a fresh Map), i.e. allocation proportional to the
    * vocabulary on the reduce path. This state runs the identical
    * algorithm over two parallel arrays + a slot index: hits are one
    * hash probe + in-place add, the decrement-all path is two in-place
    * array sweeps with zero allocation, and merge is the same Agarwal
    * et al. rule computed on a scratch map once per partial (not per
    * row). Buffer encoding is a product over (k, keys, vals, n) — the
    * slot index is @transient and rebuilt lazily after
    * deserialization. */
  final case class MGState(k: Int, keys: Array[String], vals: Array[Long],
      var n: Int) {
    @transient private lazy val idx = {
      val m = new java.util.HashMap[String, Integer](2 * k)
      var i = 0
      while (i < n) { m.put(keys(i), i); i += 1 }
      m
    }
    private def insert(item: String, w: Long): Unit = {
      keys(n) = item; vals(n) = w; idx.put(item, n); n += 1
    }
    private def removeSlot(i: Int): Unit = {
      idx.remove(keys(i))
      n -= 1
      if (i != n) {
        keys(i) = keys(n); vals(i) = vals(n); idx.put(keys(i), i)
      }
      keys(n) = null
    }
    def add(item: String, w0: Long): Unit = {
      var w = w0
      while (w > 0) {
        val s = idx.get(item)
        if (s != null) { vals(s.intValue) += w; return }
        if (n < k) { insert(item, w); return }
        // decrement-all by min(w, current min); zeroed slots are freed
        // (the swapped-in tail element is re-examined, not skipped)
        var mn = Long.MaxValue
        var i = 0
        while (i < n) { if (vals(i) < mn) mn = vals(i); i += 1 }
        val d = math.min(w, mn)
        i = 0
        while (i < n) {
          vals(i) -= d
          if (vals(i) == 0L) removeSlot(i) else i += 1
        }
        w -= d
      }
    }
    /** Agarwal et al. merge: sum counters, subtract the (k+1)-largest,
      * drop non-positives — identical to MG.++ . */
    def mergeIn(o: MGState): MGState = {
      val m = new java.util.HashMap[String, java.lang.Long](
        2 * (n + o.n) + 1)
      var i = 0
      while (i < n) { m.put(keys(i), vals(i)); i += 1 }
      i = 0
      while (i < o.n) {
        val prev = m.get(o.keys(i))
        m.put(o.keys(i),
          if (prev == null) o.vals(i) else prev.longValue + o.vals(i))
        i += 1
      }
      var d = 0L
      if (m.size > k) {
        val vs = new Array[Long](m.size)
        val it0 = m.values().iterator()
        var j = 0
        while (it0.hasNext) { vs(j) = it0.next().longValue; j += 1 }
        java.util.Arrays.sort(vs)
        d = vs(vs.length - 1 - k) // the (k+1)-largest value
      }
      val out = MGState(k, new Array[String](k), new Array[Long](k), 0)
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val v = e.getValue.longValue - d
        if (v > 0) out.insert(e.getKey, v)
      }
      out
    }
    def toSortedSeq: Seq[(String, Long)] =
      (0 until n).map(i => keys(i) -> vals(i))
        .sortBy { case (it, c) => (-c, it) }
  }
  final class FreqItemsAgg(k: Int)
      extends Aggregator[String, MGState, Seq[(String, Long)]] {
    override def zero: MGState =
      MGState(k, new Array[String](k), new Array[Long](k), 0)
    override def reduce(b: MGState, a: String): MGState = { b.add(a, 1L); b }
    override def merge(x: MGState, y: MGState): MGState = x.mergeIn(y)
    /** Survivors sorted by retained count desc, then item — determinism
      * of the ORDER is guaranteed; the retained counts themselves are
      * order-dependent (as for any MG), only their error bound is not. */
    override def finish(r: MGState): Seq[(String, Long)] = r.toSortedSeq
    override def bufferEncoder: Encoder[MGState] = Encoders.product[MGState]
    override def outputEncoder: Encoder[Seq[(String, Long)]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Seq[(String, Long)]]()
  }

  /** Fixed-point Gram accumulator for q225: per input vector, quantize
    * each component to round(x·1e4) (the exact BigDecimal HALF_UP
    * Spark's own Round uses, so the result is byte-identical to the SQL
    * `round()` path) and accumulate all upper-triangle pair products,
    * the per-dim sums and the row count into ONE mutable long buffer of
    * size d²+d+1 (layout: pairs at i·d+j for i<j, dim sums at d²+i, the
    * count at d²+d). State is O(d²) regardless of input size and the
    * merge is element-wise add, so Spark's partial+final aggregation
    * ships one 33 KB buffer per task instead of exploding n·d²/2 rows
    * through a Generate (measured 44 s → sub-second at the 100×
    * replica: HOF lambdas never codegen, a fused JVM loop does the
    * same multiplies at memory speed). */
  final class GramAgg(d: Int)
      extends Aggregator[Seq[Float], Array[Long], Seq[Long]] {
    private val size = d * d + d + 1
    override def zero: Array[Long] = new Array[Long](size)
    override def reduce(buf: Array[Long], xs: Seq[Float]): Array[Long] = {
      val q = new Array[Long](d)
      var i = 0
      while (i < d) {
        q(i) = BigDecimal(xs(i).toDouble * 10000)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        i += 1
      }
      i = 0
      while (i < d) {
        val qi = q(i)
        val base = i * d
        buf(d * d + i) += qi
        var j = i + 1
        while (j < d) { buf(base + j) += qi * q(j); j += 1 }
        i += 1
      }
      buf(d * d + d) += 1L
      buf
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < size) { x(i) += y(i); i += 1 }
      x
    }
    override def finish(r: Array[Long]): Seq[Long] = r.toSeq
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Seq[Long]]()
  }

  /** Fixed-point permutation-test accumulator for q248 (the GramAgg
    * pattern applied to Monte-Carlo lanes): per (userHash, metric)
    * input, add ±metric into each of `lanes` slots, the sign drawn
    * from the user's 32-bit hash by the multiplicative draw
    * ((h·(2k+3)) mod 1000003) mod 2 — integer-exact in any engine.
    * State is O(lanes) regardless of user count and merges
    * element-wise, so the 256-lane sweep is ONE user-scale pass with
    * map-side combine — the explode shape would shuffle users×lanes
    * rows (the r10 fused-buffer rule: a per-row O(k) expansion feeding
    * a low-cardinality aggregate belongs in an Aggregator buffer). */
  final class PermLanesAgg(lanes: Int)
      extends Aggregator[(Long, Long), Array[Long], Seq[Long]] {
    override def zero: Array[Long] = new Array[Long](lanes)
    override def reduce(buf: Array[Long], in: (Long, Long)): Array[Long] = {
      val (h, m) = in
      var k = 0
      while (k < lanes) {
        if ((h * (2L * k + 3L)) % 1000003L % 2L == 0L) buf(k) += m
        else buf(k) -= m
        k += 1
      }
      buf
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < lanes) { x(i) += y(i); i += 1 }
      x
    }
    override def finish(r: Array[Long]): Seq[Long] = r.toSeq
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Seq[Long]]()
  }
}
