package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Reducer surface — Spark-native equivalents of the reference's
  * `src/dask_awkward/lib/reducers.py` (589 lines, __all__ at reducers.py:14-34).
  *
  * Two regimes, mirroring the reference:
  *  - axis>=1 (per-row list reductions) -> SQL higher-order `aggregate` /
  *    array builtins, all codegen'd Column expressions;
  *  - axis=0 / global -> Spark's native partial+final aggregation
  *    (`HashAggregateExec` partial/merge/final), which replaces the
  *    reference's `AwkwardTreeReductionLayer` (core.py:2349-2457) — Spark's
  *    map-side partial aggregation is the same tree-reduction idea, executed
  *    by the engine rather than hand-built layers.
  *
  * We also implement the ops the reference left as TODO stubs (`ptp`
  * reducers.py:452-461, `softmax` reducers.py:464-473, `corr`/`covar`/
  * `linear_fit`/`moment` reducers.py:173-184/257-268/271-282/404-415, `mean`/
  * `std`/`var` at axis=0) since Spark provides them natively.
  */
object Reducers {

  // ---- per-row (axis=1), over an array column -------------------------

  /** reference `sum(axis=1)` (reducers.py:517-548). */
  def sumArr(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x.cast("double"))

  /** Integer-typed per-row sum (exact, no float error). */
  def sumArrLong(arr: Column): Column =
    aggregate(arr, lit(0L), (acc, x) => acc + x.cast("long"))

  /** reference `prod(axis=1)` (reducers.py:418-449). */
  def prodArr(arr: Column): Column =
    aggregate(arr, lit(1.0), (acc, x) => acc * x.cast("double"))

  /** reference `min`/`max(axis=1)` (reducers.py:361-401 / 285-325). */
  def minArr(arr: Column): Column = array_min(arr)
  def maxArr(arr: Column): Column = array_max(arr)

  /** reference `count(axis=1)` (reducers.py:187-219). */
  def countArr(arr: Column): Column = size(arr)

  /** reference `count_nonzero(axis=1)` (reducers.py:222-254). */
  def countNonzeroArr(arr: Column): Column =
    size(filter(arr, x => x =!= lit(0)))

  /** reference `any`/`all(axis=1)` (reducers.py:71-102 / 37-68). */
  def anyArr(arr: Column, pred: Column => Column): Column = exists(arr, pred)
  def allArr(arr: Column, pred: Column => Column): Column = forall(arr, pred)

  /** reference `argmin`/`argmax(axis=1)` (reducers.py:105-170); 0-based index
    * of the first occurrence, matching numpy/awkward semantics. */
  def argminArr(arr: Column): Column = array_position(arr, array_min(arr)) - 1
  def argmaxArr(arr: Column): Column = array_position(arr, array_max(arr)) - 1

  /** reference `mean(axis=1)` (reducers.py:328-358). */
  def meanArr(arr: Column): Column = sumArr(arr) / size(arr)

  /** reference `var(axis=1)` with ddof (reducers.py:559-589):
    * E[x^2] - E[x]^2, scaled by n/(n-ddof). */
  def varArr(arr: Column, ddof: Int = 0): Column = {
    val n = size(arr).cast("double")
    val m = meanArr(arr)
    val m2 = aggregate(arr, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")) / n
    // null when n <= ddof (matches numpy's nan for dof<=0; keeps ANSI mode
    // from raising divide-by-zero)
    when(n > lit(ddof.toDouble), (m2 - m * m) * n / (n - lit(ddof.toDouble)))
  }

  /** reference `std(axis=1)` (reducers.py:484-514). */
  def stdArr(arr: Column, ddof: Int = 0): Column = sqrt(varArr(arr, ddof))

  /** reference `ptp(axis=1)` — TODO in the reference (reducers.py:452-461). */
  def ptpArr(arr: Column): Column = array_max(arr) - array_min(arr)

  /** reference `softmax(axis=1)` — TODO in the reference (reducers.py:464-473). */
  def softmaxArr(arr: Column): Column =
    ArrayOps.bindOnce(arr) { a =>
      // the denominator is referenced inside the per-element lambda — bind
      // it too, or the O(n) sum re-runs for every element (O(n²) per row)
      ArrayOps.bindOnce(aggregate(a, lit(0.0), (acc, x) => acc + exp(x))) {
        denom => transform(a, x => exp(x) / denom)
      }
    }

  /** reference `moment(n, axis=1)` — TODO in the reference
    * (reducers.py:404-415): n-th central moment E[(x-mean)^n]. */
  def momentArr(arr: Column, n: Int): Column =
    ArrayOps.bindOnce(arr) { a =>
      // bind the mean: it is referenced inside the aggregate's lambda and
      // would otherwise be recomputed per element (O(n²) per row)
      ArrayOps.bindOnce(meanArr(a)) { m =>
        aggregate(a, lit(0.0), (acc, x) => acc + pow(x.cast("double") - m, n)) /
          size(a)
      }
    }

  /** The reference's `mask_identity` / `keepdims` reducer flags (threaded
    * through all reducers, e.g. reducers.py:521-524): mask_identity=true
    * makes the empty-list reduction null instead of the monoid identity;
    * keepdims wraps the result in a length-1 list. */
  def withFlags(arr: Column, reduced: Column, maskIdentity: Boolean = false,
      keepdims: Boolean = false): Column = {
    val masked =
      if (maskIdentity) when(size(arr) > 0, reduced) else reduced
    if (keepdims) array(masked) else masked
  }

  // ---- global (axis=0) — native Spark partial+final aggregates ---------

  /** reference global TODOs made real: corr (reducers.py:173-184),
    * covar (reducers.py:257-268), linear_fit (reducers.py:271-282). */
  def corrGlobal(a: Column, b: Column): Column = corr(a, b)
  def covarGlobal(a: Column, b: Column): Column = covar_samp(a, b)
  def linearFitSlope(x: Column, y: Column): Column = regr_slope(y, x)
  def linearFitIntercept(x: Column, y: Column): Column = regr_intercept(y, x)
}
