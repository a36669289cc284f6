package graft.tsdb

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-level set/merge/dedup operators (SURVEY §2.3 J3/J5, §2.6 O2/O6/O7).
  */
object PointOps {

  /** Last-write-wins dedup per (series, ts): the sample with the highest
    * ingest sequence survives (reference: `types/metric.go:71-95` sorts by
    * timestamp and keeps the last duplicate seen).
    * One hash aggregate; no window needed (max_by is a single pass).
    */
  def dedupLastWriteWins(
      points: DataFrame,
      keys: Seq[String],
      seq: String,
      value: String = "value"): DataFrame =
    points
      .groupBy(keys.map(col): _*)
      .agg(max_by(col(value), col(seq)).as(value))

  /** Hot ∪ cold merge: per series, cold (persisted) points strictly before
    * the series' first hot (in-memory) timestamp, then all hot points —
    * the reference cuts the persistent read at `firstTemporaryTs - 1`
    * (`batch/batch.go:787-861`, `tryNext`). Series absent from the hot set
    * keep their full cold history.
    *
    * The per-series boundary is one row per hot series, joined back with
    * NO broadcast hint: AQE sees the aggregate's runtime size and picks a
    * broadcast join while the hot set is small, and falls back to a
    * shuffled join when billions of series are concurrently hot — an
    * unconditional hint would OOM the driver there (same delegation as
    * the T9 TTL dim).
    */
  def hotColdMerge(
      cold: DataFrame,
      hot: DataFrame,
      series: Seq[String],
      tsMs: String = "ts_ms"): DataFrame = {
    val boundary = hot
      .groupBy(series.map(col): _*)
      .agg(min(col(tsMs)).as("__first_hot_ms"))
    val coldKept = cold
      .join(boundary, series, "left")
      .where(col("__first_hot_ms").isNull || col(tsMs) < col("__first_hot_ms"))
      .drop("__first_hot_ms")
    coldKept.unionByName(hot)
  }

  /** PromQL `and`: left series that also exist on the right (left-semi). */
  def vectorAnd(left: DataFrame, right: DataFrame, on: Seq[String]): DataFrame =
    left.join(right.select(on.map(col): _*).distinct(), on, "left_semi")

  /** PromQL `unless`: left series with no match on the right (left-anti). */
  def vectorUnless(left: DataFrame, right: DataFrame, on: Seq[String]): DataFrame =
    left.join(right.select(on.map(col): _*).distinct(), on, "left_anti")

  /** PromQL `or`: left plus right series not present on the left. */
  def vectorOr(left: DataFrame, right: DataFrame, on: Seq[String]): DataFrame =
    left.unionByName(right.join(
      left.select(on.map(col): _*).distinct(), on, "left_anti"))

  /** Series-count limit guard (reference aborts the query once more than N
    * series are selected, `api/promql/limiting_index.go:48-64`). Returns the
    * first N series in deterministic label order; callers treat presence of
    * row N+1 as the abort signal (probe with limit n+1).
    */
  def seriesLimit(seriesSet: DataFrame, order: Seq[Column], n: Int): DataFrame =
    seriesSet.orderBy(order: _*).limit(n)

  /** Top-k per group: PromQL `topk(k, expr) by (group)` — `row_number` over
    * (value desc, tiebreak) so results are deterministic
    * (SURVEY §2.5 W8). The window is partitioned by the group key, so this
    * scales out; no global sort.
    */
  def topK(
      df: DataFrame,
      group: Seq[String],
      value: Column,
      tiebreak: Seq[Column],
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window
      .partitionBy(group.map(col): _*)
      .orderBy(value.desc +: tiebreak.map(_.asc): _*)
    df.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
