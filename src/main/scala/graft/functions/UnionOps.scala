package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tagged-union encoding — SURVEY §7.4 item 1 (the reference's `UnionForm`,
  * the one Awkward layout node with no native Spark type). Encoding: a
  * struct with an int discriminant plus one nullable field per variant,
  * exactly one of which is non-null — the same flattening the reference's
  * own JSONSchema export uses (io/json.py:867-870).
  */
object UnionOps {

  /** Build a union value: `variants(i)._2` is stored when `tag === i`. */
  def makeUnion(tag: Column, variants: Seq[(String, Column)]): Column =
    struct(
      (tag.cast("int").as("tag") +:
        variants.zipWithIndex.map { case ((name, v), i) =>
          when(tag === i, v).as(name)
        }): _*)

  def unionTag(u: Column): Column = u.getField("tag")

  /** Value of variant `name` (null unless active). */
  def unionGet(u: Column, name: String): Column = u.getField(name)

  /** Eliminate a union: apply `cases(i)` to variant i's value. All case
    * results must share a type (like any CASE expression). */
  def matchUnion(u: Column, cases: Seq[(String, Column => Column)]): Column =
    cases.zipWithIndex.foldLeft(lit(null).cast("string").asInstanceOf[Column]) {
      case (acc, ((name, f), i)) =>
        when(unionTag(u) === i, f(u.getField(name))).otherwise(acc)
    }
}
