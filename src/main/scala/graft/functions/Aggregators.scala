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
  final class MinKAgg(k: Int) extends Aggregator[Long, MinK, Seq[Long]] {
    override def zero: MinK = MinK(k, Nil)
    override def reduce(b: MinK, a: Long): MinK = b.add(a)
    override def merge(x: MinK, y: MinK): MinK = x ++ y
    override def finish(r: MinK): Seq[Long] = r.vals
    override def bufferEncoder: Encoder[MinK] = Encoders.product[MinK]
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }
}
