package graft.tsdb

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Raw ↔ pre-aggregated routing (SURVEY §2.4 A2/A3/A4).
  *
  * The reference serves long-range queries from 5-min pre-aggregated rows up
  * to a `fullyAggregatedAt` watermark and re-aggregates the raw tail at query
  * time so rates don't jump at the boundary (`cassandra/tsdb/read.go:57-72,
  * 111-134, 229-237`). Function → column routing: min→min, max→max,
  * avg/default→avg, count→count, and the counter family (rate/irate/
  * increase/resets) reads max to avoid fake counter resets from averaging
  * (`read.go:594-613`).
  */
object PreAgg {

  /** Which pre-agg column a PromQL function must read. */
  def columnFor(function: String): String = function match {
    case "min" | "min_over_time" => "min"
    case "max" | "max_over_time" => "max"
    case "count" | "count_over_time" => "count"
    case "rate" | "irate" | "increase" | "resets" => "max" // counter safety
    case _ => "avg"
  }

  /** Pre-agg rows for buckets that end at or before the watermark, plus the
    * raw tail downsampled at query time — the union is seamless for any
    * downstream aggregate. `points` must carry series cols + ts_ms + value.
    */
  def routed(
      points: DataFrame,
      agg5m: DataFrame,
      series: Seq[String],
      watermarkMs: Long,
      resolutionMs: Long = Downsample.DefaultResolutionMs): DataFrame = {
    val cols = series.map(col) ++ Seq(
      col("bucket_ms"), col("min"), col("max"), col("avg"), col("count"))
    val old = agg5m.where(col("bucket_ms") + resolutionMs <= watermarkMs)
      .select(cols: _*)
    val tailFloorMs = watermarkMs - watermarkMs % resolutionMs
    val tail = Downsample(
      points.where(col("ts_ms") >= tailFloorMs),
      series.map(col), col("ts_ms"), col("value"), resolutionMs)
      .select(cols: _*)
    old.unionByName(tail)
  }

  /** Merge bucketed min/max/avg/count back into range-level aggregates
    * (weighted avg = Σ(avg·count)/Σcount). This is how a query spanning
    * pre-agg + raw computes a single value per series.
    */
  def mergeBuckets(routed: DataFrame, series: Seq[String]): DataFrame =
    routed
      .groupBy(series.map(col): _*)
      .agg(
        min("min").as("min"),
        max("max").as("max"),
        (sum(col("avg") * col("count")) / sum(col("count"))).as("avg"),
        sum("count").as("count"))
}
