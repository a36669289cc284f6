package graft.tsdb

import graft.functions.Bits
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Downsampling kernel — the reference's 5-minute pre-aggregation
  * (reference: `aggregate/aggregate.go:43-137`; resolution const
  * `cassandra/tsdb/tsdb.go:41`). Semantics reproduced exactly:
  *
  *  - bucket key = `ts - ts % resolution`
  *  - Prometheus StaleNaN samples are skipped entirely
  *  - a bucket whose samples are ALL stale is dropped
  *  - `count` counts only non-stale samples
  *  - `avg` is poisoned by any ordinary NaN (sum/count propagates NaN),
  *    emitted as Prometheus NormalNaN
  *  - `min`/`max` ignore ordinary NaN unless every value is NaN
  *    (Go's `v < min || isNaN(min)` update rule)
  *
  * Spark builtins differ on NaN (Spark sorts NaN greater than any double, so
  * `max` would return NaN), hence the explicit NaN handling below. Shuffle
  * profile: one partial+final hash aggregate keyed on (series, bucket) —
  * the same shape the reference computes single-threaded per id-shard
  * (`cassandra/tsdb/aggregate.go:441-492`), but set-oriented so it scales
  * with executors instead of the 60-shard loop.
  */
object Downsample {
  val DefaultResolutionMs: Long = 5 * 60 * 1000L

  /** Bucket start (ms) for a ms timestamp column. */
  def bucket(tsMs: Column, resolutionMs: Long = DefaultResolutionMs): Column =
    (tsMs - pmod(tsMs, lit(resolutionMs))).as("bucket_ms")

  /** @param series grouping columns identifying a series
    * @return one row per (series, bucket): min, max, avg, count
    */
  def apply(
      points: DataFrame,
      series: Seq[Column],
      tsMs: Column,
      value: Column,
      resolutionMs: Long = DefaultResolutionMs): DataFrame = {
    val nonStale = points.filter(!Bits.isStaleNaN(value))
    val vNoNaN = when(!isnan(value), value)
    nonStale
      .groupBy(series :+ bucket(tsMs, resolutionMs): _*)
      .agg(
        coalesce(min(vNoNaN), Bits.normalNaN).as("min"),
        coalesce(max(vNoNaN), Bits.normalNaN).as("max"),
        when(isnan(avg(value)), Bits.normalNaN)
          .otherwise(avg(value)).as("avg"),
        count(value).as("count"))
  }
}
