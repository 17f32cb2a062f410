package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType, StructType}

/** Engine-side optimizer rule (SURVEY §7.3 path (c) demonstration):
  * `size(filter(arr, λ)) > 0`  -> `exists(arr, λ)` and
  * `size(filter(arr, λ)) = 0`  -> `NOT exists(arr, λ)`.
  *
  * The left form materializes the filtered array and counts it; `exists`
  * short-circuits on the first match — on long inner lists (the jagged
  * data this engine targets) that's an asymptotic win, and it is exactly
  * the kind of nested-expression rewrite Catalyst doesn't do itself.
  *
  * ArrayExists is built with followThreeValuedLogic=false so the rewrite
  * is semantics-preserving when the predicate returns null (filter treats
  * null as drop; 3VL exists would return null instead of false).
  */
object SizeFilterToExists extends Rule[LogicalPlan] {

  private def exists(arr: Expression, f: Expression): Expression =
    ArrayExists(arr, f, followThreeValuedLogic = false)

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case GreaterThan(Size(ArrayFilter(arr, f), _), Literal(0, IntegerType)) =>
        exists(arr, f)
      case LessThan(Literal(0, IntegerType), Size(ArrayFilter(arr, f), _)) =>
        exists(arr, f)
      case EqualTo(Size(ArrayFilter(arr, f), _), Literal(0, IntegerType)) =>
        Not(exists(arr, f))
      case EqualTo(Literal(0, IntegerType), Size(ArrayFilter(arr, f), _)) =>
        Not(exists(arr, f))
    }
}

/** Extract-first rewrite for HOF nested pruning (the engine's one real
  * optimizer-parity gap vs the reference's buffer-level necessary-columns,
  * `reference src/dask_awkward/lib/optimize.py:69-223`): Spark's
  * SchemaPruning does not see through lambda variables, so
  * `transform(points, p -> p.x * 2)` reads the FULL element struct from
  * parquet even though only `x` is touched. The documented manual idiom
  * (extract fields first, then run HOFs on the extracted arrays —
  * COVERAGE.md §2.2) is exactly mechanical, so this rule performs it:
  *
  *   transform(arr, p -> f(p.x))      -> transform(arr.x, v -> f(v))
  *   transform(arr, p -> f(p.x, p.y)) -> zip_with(arr.x, arr.y,
  *                                         (vx, vy) -> f(vx, vy))
  *   exists/forall(arr, p -> pred(p.x)) -> exists/forall(arr.x, v -> pred(v))
  *   aggregate(arr, z, (acc, p) -> m(acc, p.x), fin)
  *                                    -> aggregate(arr.x, z, (acc, v) ->
  *                                         m(acc, v), fin)
  *
  * after which `arr.x` is a GetArrayStructFields that SchemaPruning DOES
  * understand, and the scan's ReadSchema drops the untouched fields — on
  * a 100 TB corpus whose element structs carry wide payload fields, the
  * difference is reading the whole nested column vs one leaf.
  *
  * Semantics-preserving by construction: a null element yields null
  * extracted leaves exactly as `p.x` on a null `p` does; zip_with zips
  * equal-length arrays extracted from the SAME input; element order and
  * 3VL flags are preserved node-for-node. Guards: no index-form lambdas,
  * every use of the element variable is a direct field access, single
  * leaf only for exists/forall/aggregate, and transform's two-field form
  * requires a cheap (pure attribute/field-chain) array so duplicating
  * the reference costs nothing. Fires in the operator-optimization
  * batch, which runs BEFORE SchemaPruning's "Early Filter and Projection
  * Push-Down" batch. */
object TransformFieldExtraction extends Rule[LogicalPlan] {

  private def bareUse(e: Expression, v: NamedLambdaVariable): Boolean =
    e match {
      case GetStructField(nv: NamedLambdaVariable, _, _)
          if nv.exprId == v.exprId => false
      case nv: NamedLambdaVariable if nv.exprId == v.exprId => true
      case other => other.children.exists(bareUse(_, v))
    }

  private def cheap(e: Expression): Boolean = e match {
    case _: Attribute => true
    case GetStructField(c, _, _) => cheap(c)
    case _ => false
  }

  private def structArray(arr: Expression): Option[(ArrayType, StructType)] =
    arr.dataType match {
      case at @ ArrayType(st: StructType, _) => Some((at, st))
      case _ => None
    }

  private def ordsOf(body: Expression, v: NamedLambdaVariable): Seq[Int] =
    body.collect {
      case GetStructField(nv: NamedLambdaVariable, ord, _)
          if nv.exprId == v.exprId => ord
    }.distinct.sorted

  private def extract(arr: Expression, at: ArrayType, st: StructType,
      ord: Int): Expression =
    GetArrayStructFields(arr, st(ord), ord, st.length,
      at.containsNull || st(ord).nullable)

  private def leafVar(v: NamedLambdaVariable, at: ArrayType, st: StructType,
      ord: Int): NamedLambdaVariable =
    NamedLambdaVariable(v.name + "_" + st(ord).name,
      st(ord).dataType, at.containsNull || st(ord).nullable)

  /** Single-leaf rewrite shared by every HOF shape: if the element
    * variable is used only as `v.field` for exactly ONE field, return
    * (extracted array, fresh leaf variable, rewritten body). */
  private def single(arr: Expression, v: NamedLambdaVariable,
      body: Expression)
      : Option[(Expression, NamedLambdaVariable, Expression)] =
    structArray(arr).flatMap { case (at, st) =>
      if (bareUse(body, v)) None
      else ordsOf(body, v) match {
        case Seq(ord) =>
          val nv = leafVar(v, at, st, ord)
          val nb = body.transformUp {
            case GetStructField(x: NamedLambdaVariable, o, _)
                if x.exprId == v.exprId && o == ord => nv
          }
          Some((extract(arr, at, st, ord), nv, nb))
        case _ => None
      }
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case t @ ArrayTransform(arr,
          LambdaFunction(body, Seq(v: NamedLambdaVariable), hidden))
          if structArray(arr).isDefined && !bareUse(body, v) =>
        val (at, st) = structArray(arr).get
        ordsOf(body, v) match {
          case Seq(_) =>
            val (ea, nv, nb) = single(arr, v, body).get
            ArrayTransform(ea, LambdaFunction(nb, Seq(nv), hidden))
          case Seq(o1, o2) if cheap(arr) =>
            val n1 = leafVar(v, at, st, o1)
            val n2 = leafVar(v, at, st, o2)
            val nb = body.transformUp {
              case GetStructField(x: NamedLambdaVariable, o, _)
                  if x.exprId == v.exprId =>
                if (o == o1) n1 else n2
            }
            ZipWith(extract(arr, at, st, o1), extract(arr, at, st, o2),
              LambdaFunction(nb, Seq(n1, n2), hidden))
          case _ => t
        }
      case e @ ArrayExists(arr,
          LambdaFunction(body, Seq(v: NamedLambdaVariable), hidden), tvl) =>
        single(arr, v, body).fold(e: Expression) { case (ea, nv, nb) =>
          ArrayExists(ea, LambdaFunction(nb, Seq(nv), hidden), tvl)
        }
      case f @ ArrayForAll(arr,
          LambdaFunction(body, Seq(v: NamedLambdaVariable), hidden)) =>
        single(arr, v, body).fold(f: Expression) { case (ea, nv, nb) =>
          ArrayForAll(ea, LambdaFunction(nb, Seq(nv), hidden))
        }
      case a @ ArrayAggregate(arr, zero,
          LambdaFunction(mbody,
            Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), hidden),
          finish) =>
        single(arr, v, mbody).fold(a: Expression) { case (ea, nv, nb) =>
          ArrayAggregate(ea, zero,
            LambdaFunction(nb, Seq(acc, nv), hidden), finish)
        }
    }
}
