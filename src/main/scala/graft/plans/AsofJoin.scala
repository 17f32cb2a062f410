package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator extension (SURVEY §7.3 path (c)): a NATIVE backward as-of
  * join — custom `LogicalPlan` node + `SparkStrategy` + `SparkPlan` — the
  * one rung of the extension ladder the window-union form
  * ([[graft.functions.JoinOps.asofBackward]]) does not exercise.
  *
  * Physical algorithm: both sides hash-clustered on the key and sorted by
  * (key, ts) — declared via `requiredChildDistribution` /
  * `requiredChildOrdering`, so EnsureRequirements plans the exchanges and
  * sorts and AQE coalesces the two shuffles consistently (the same
  * contract `CoGroupExec` relies on). Each co-partition pair then merges
  * in ONE streaming pass: advance the right iterator while its (key, ts)
  * is at-or-before the current left row, remembering the last snapshot per
  * key — O(|L| + |R|) per partition, no window buffer, no union
  * materialization.
  *
  * Semantics match [[graft.functions.JoinOps.asofBackward]]: left outer;
  * `l.ts >= r.ts` bound (equal ts matches); right rows with null key/ts
  * are dropped; left rows with null key/ts emit unmatched. Among right
  * rows tied on (key, ts) the last in sort order wins; the required right
  * ordering appends the remaining orderable right columns so that winner
  * is the row-contents maximum — deterministic run-to-run and identical
  * to the window form's `__r` tie-break. (DuckDB's native ASOF still
  * picks an ARBITRARY tied row, so oracle comparisons need tie-free
  * right sides — see [[graft.functions.JoinOps.asofBackward]].)
  */
case class AsofJoinNode(left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lk, lts, rk, rts) =>
      AsofJoinExec(lk, lts, rk, rts, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = {
    // right rows tied on (key, ts) would otherwise resolve by shuffle
    // arrival order; appending the remaining orderable right columns makes
    // the winning snapshot deterministic (mirrors asofBackward's __r key)
    val tieBreak = right.output
      .filterNot(a => a.semanticEquals(rightKey) || a.semanticEquals(rightTs))
      .filter(a => org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(a.dataType))
      .map(SortOrder(_, Ascending))
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)) ++
        tieBreak)
  }

  // rows stream out in left order, one output row per left row — advertise
  // the left child's partitioning and our required (key, ts) ordering so a
  // downstream groupBy(key) or sort reuses them instead of re-exchanging
  // (the same contract SortMergeJoinExec honors)
  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val lOut = left.output
    val rOut = right.output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // upcast to Expression: bindReference[A] casts its result back to A,
      // and the bound result is a BoundReference, not an Attribute
      val blKey = BindReferences.bindReference(leftKey: Expression, lOut)
      val blTs = BindReferences.bindReference(leftTs: Expression, lOut)
      val brKey = BindReferences.bindReference(rightKey: Expression, rOut)
      val brTs = BindReferences.bindReference(rightTs: Expression, rOut)
      val rBuf = rIter.buffered
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)
      // the input schema must carry the LOOSENED nullability: unmatched
      // left rows pair with an all-null right, and binding against the
      // right's original non-nullable attrs would elide the null checks
      val proj = UnsafeProjection.create(output,
        lOut ++ rOut.map(_.withNullability(true)))
      // last at-or-before snapshot; stale entries from earlier keys are
      // ignored by the snapKey equality check, then overwritten
      var snap: InternalRow = null
      var snapKey: Any = null
      new Iterator[InternalRow] {
        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = blKey.eval(l)
          val lts = blTs.eval(l)
          if (lk != null && lts != null) {
            var advancing = true
            while (advancing && rBuf.hasNext) {
              val rk = brKey.eval(rBuf.head)
              val rts = brTs.eval(rBuf.head)
              if (rk == null || rts == null) rBuf.next() // ASOF drops these
              else {
                val c = keyOrd.compare(rk, lk)
                if (c < 0) rBuf.next() // earlier key: its left rows are done
                else if (c == 0 && tsOrd.compare(rts, lts) <= 0) {
                  snap = rBuf.next().copy() // retained past the iterator
                  // re-eval from the COPIED row: rk may be a UTF8String /
                  // Decimal / Binary view into the reused shuffle row buffer,
                  // clobbered when rBuf advances
                  snapKey = brKey.eval(snap)
                } else advancing = false
              }
            }
          }
          val matched = lk != null && lts != null && snap != null &&
            keyOrd.compare(snapKey, lk) == 0
          proj(joined(l, if (matched) snap else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}
