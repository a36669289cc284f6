package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured-Streaming ingest path (SURVEY §2.8). The reference buffers
  * 15 min of points per metric with hand-rolled ownership/flush machinery
  * (`batch/batch.go`); under Spark that whole layer is a `readStream` →
  * watermark → windowed aggregate → sink, with exactly-once from
  * checkpointing instead of ownership locks (T1-T5, T10 disappear).
  */
object Ingest {

  /** The ingest projection applied to every incoming sample (reference:
    * `api/remotestorage/write.go:80-137` + future-point backdating
    * `api/fake_remote_writer.go:47-64`): tenant injection, validation,
    * and backdating of samples too far in the future.
    */
  def ingestProjection(df: DataFrame, tenant: String,
      maxFutureMs: Long, nowMs: Long): DataFrame =
    df
      .withColumn("tenant", lit(tenant))
      .where(col("event_type").isNotNull && col("event_type") =!= "")
      .withColumn("ts_ms",
        when(col("ts_ms") > nowMs + maxFutureMs, col("ts_ms") - maxFutureMs)
          .otherwise(col("ts_ms")))

  /** Stream the events parquet through a watermarked 5-min windowed
    * aggregate into an in-memory sink, synchronously (AvailableNow); returns
    * the final aggregate. Complete output mode so the result equals the
    * batch group-by — which is exactly what the correctness oracle checks.
    */
  def windowedCounts(spark: SparkSession, dir: String, name: String): DataFrame = {
    val static = spark.read.parquet(s"$dir/events.parquet")
    val stream = spark.readStream
      .schema(static.schema)
      .parquet(s"$dir/events.parquet")
      .withColumn("ts_ms", expr("ts div 1000000"))
      .withColumn("ts_utc", timestamp_millis(col("ts_ms")))
    val agg = stream
      .withWatermark("ts_utc", "8 hours") // reference MaxPastDelay, aggregate.go:48
      .groupBy(window(col("ts_utc"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 6).as("sum_value"))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
      .select(
        unix_millis(col("window.start")).as("bucket_ms"),
        col("event_type"), col("n"), col("sum_value"))
  }
}
