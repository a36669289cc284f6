package graft.tsdb

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PromQL range-vector semantics on flat point rows.
  *
  * The reference delegates these to the embedded Prometheus engine
  * (`api/promql/engine.go:27`); here they are compiled to Spark windows and
  * grid joins (SURVEY §2.5 W1/W2/W7):
  *
  *  - `overTime`: per-sample trailing windows via `rangeBetween` on ms longs
  *    — no shuffle beyond the initial repartition by series, no step grid.
  *  - `stepGrid` + `instantAt`/`rangeAt`: explicit `query_range(start, end,
  *    step)` evaluation — a generated step grid joined against samples.
  *    A PromQL range selector `m[R]` is (t-R, t] (left-open), and instant
  *    selectors take the latest sample within the lookback delta (5 min
  *    default, `api/promql/engine.go:42`).
  *
  * Scale note: the grid join is a range-bounded equi-ish join; for 100 TB it
  * shuffles points once on series and replicates the (tiny) grid broadcast,
  * so the expensive side moves only once. The `rangeBetween` form avoids the
  * grid entirely when eval points coincide with samples.
  */
object RangeWindows {
  val LookbackDeltaMs: Long = 5 * 60 * 1000L

  /** Trailing range-window aggregates evaluated at every sample timestamp:
    * `[avg|min|max|sum|count]_over_time(m[rangeMs])` with the window
    * anchored at each sample. Window frame is [ts-rangeMs+1, ts] to match
    * PromQL's left-open (t-R, t].
    */
  def overTime(
      points: DataFrame,
      series: Seq[String],
      rangeMs: Long,
      aggs: Seq[Column => Column],
      names: Seq[String],
      tsMs: String = "ts_ms",
      value: String = "value"): DataFrame = {
    val w = Window
      .partitionBy(series.map(col): _*)
      .orderBy(col(tsMs))
      .rangeBetween(-rangeMs + 1, Window.currentRow)
    val outCols = aggs.zip(names).map { case (a, n) => a(col(value)).over(w).as(n) }
    points.select(series.map(col) ++ Seq(col(tsMs), col(value)) ++ outCols: _*)
  }

  /** Evaluation grid: one row per step timestamp in [startMs, endMs]. */
  def stepGrid(spark: org.apache.spark.sql.SparkSession,
      startMs: Long, endMs: Long, stepMs: Long): DataFrame = {
    import spark.implicits._
    spark.range(0, (endMs - startMs) / stepMs + 1)
      .select((lit(startMs) + $"id" * stepMs).as("eval_ms"))
  }

  /** Instant-vector evaluation over a grid: for each (series, eval_ms) the
    * latest sample with `eval_ms - lookback < ts <= eval_ms`. Series with no
    * sample in the window are absent (PromQL staleness).
    */
  def instantOverGrid(
      points: DataFrame,
      grid: DataFrame,
      series: Seq[String],
      lookbackMs: Long = LookbackDeltaMs,
      tsMs: String = "ts_ms",
      value: String = "value"): DataFrame = {
    val joined = points.join(
      broadcast(grid),
      col(tsMs) <= col("eval_ms") && col(tsMs) > col("eval_ms") - lookbackMs)
    joined
      .groupBy((series.map(col) :+ col("eval_ms")): _*)
      .agg(max_by(col(value), col(tsMs)).as(value))
  }

  /** Range-vector aggregation over a grid: aggregates all samples in
    * (eval_ms - rangeMs, eval_ms] per series and step.
    */
  def rangeOverGrid(
      points: DataFrame,
      grid: DataFrame,
      series: Seq[String],
      rangeMs: Long,
      aggs: Seq[(String, Column => Column)],
      tsMs: String = "ts_ms",
      value: String = "value"): DataFrame = {
    val joined = points.join(
      broadcast(grid),
      col(tsMs) <= col("eval_ms") && col(tsMs) > col("eval_ms") - rangeMs)
    joined
      .groupBy((series.map(col) :+ col("eval_ms")): _*)
      .agg(aggs.head._2(col(value)).as(aggs.head._1),
        aggs.tail.map { case (n, a) => a(col(value)).as(n) }: _*)
  }
}
