package graft.tsdb

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PromQL binary operations between instant vectors with vector matching
  * (SURVEY §2.3 J4). The reference delegates these to the embedded engine;
  * here they compile to joins on the matching-label columns:
  *
  *  - `on(labels)` one-to-one: inner equi-join; PromQL requires each side
  *    to have at most one sample per match group — callers aggregate to
  *    the match labels first, which guarantees uniqueness by construction.
  *  - `group_left` many-to-one: the right side must be unique per group;
  *    the left keeps its full label set. The right side is typically the
  *    smaller aggregate — broadcast it.
  *
  * Scale shape: one shuffle on the matching labels (or none when the
  * one-side broadcasts); no driver-side matching.
  */
object VectorMatch {

  /** Inner one-to-one match on `on` labels: emits op(left.value, right.value).
    * `leftCols` are carried through from the left side.
    */
  def oneToOne(
      left: DataFrame, right: DataFrame, on: Seq[String],
      op: (Column, Column) => Column, as: String,
      value: String = "value"): DataFrame = {
    val l = left.withColumnRenamed(value, "__lv")
    val r = right.withColumnRenamed(value, "__rv")
      .select((on :+ "__rv").map(col): _*)
    l.join(broadcastIfSmall(r), on)
      .withColumn(as, op(col("__lv"), col("__rv")))
      .drop("__lv", "__rv")
  }

  /** Many-to-one (`group_left`): every left row matches exactly one right
    * row per `on` group; right value exposed via op.
    */
  def manyToOne(
      left: DataFrame, right: DataFrame, on: Seq[String],
      op: (Column, Column) => Column, as: String,
      value: String = "value"): DataFrame =
    oneToOne(left, right, on, op, as, value)

  private def broadcastIfSmall(df: DataFrame): DataFrame =
    broadcast(df) // the one-side of group_left is an aggregate: always small
}
