package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table loaders over the driver-generated parquet test data.
  *
  * The time-series "fact" table is `events` (event_id, ts, user_id,
  * event_type, value, props). It plays the role of the reference's points
  * table (reference: `types/metric.go:34-43` — MetricPoint{Timestamp,Value}
  * grouped per MetricID). A series identity here is the label set
  * {user_id, event_type}; see [[tsdb.SeriesDim]] for the id↔labels mapping
  * (reference: `cassandra/index/index.go:4091-4108`).
  *
  * `events.ts` is parquet TIMESTAMP(NANOS), which Spark reads as a LongType
  * of nanoseconds under `spark.sql.legacy.parquet.nanosAsLong=true` (set in
  * [[GraftSession]]). All operators work on `ts_ms` (epoch milliseconds),
  * matching the reference's ms timestamps.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events normalized to the engine's point schema:
    * (event_id, user_id, event_type, ts_ms long, value double).
    * `ts div 1000000` floors ns→ms exactly like DuckDB `epoch_ns(ts)//1000000`.
    */
  def points(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .withColumn("ts_ms", expr("ts div 1000000"))
      .select("event_id", "user_id", "event_type", "ts_ms", "value")

  def documents(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")

  def embeddings(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "embeddings")
}

/** Session factory with the configuration every entry point shares.
  * 32 shuffle partitions to match local[32]; AQE on so skewed shuffles
  * re-plan at runtime (on a real cluster this is the skew-join safety net).
  */
object GraftSession {
  def configure(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      // Spark 4 defaults lower()/upper() to ICU case mappings; the first
      // use pays a minutes-long interpreted static init of
      // CollationAwareUTF8String (observed: a 500-row lower()+regex
      // projection stalling 2-4 min with all tasks blocked on the clinit).
      // JVM case mapping is identical for this engine's data and matches
      // the DuckDB oracle.
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false")

  def local(cores: Int = 32): SparkSession = {
    val s = configure(
      SparkSession.builder().master(s"local[$cores]").appName("graft"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
