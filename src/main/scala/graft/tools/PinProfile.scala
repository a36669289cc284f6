package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.streaming.Ingest

/** Micro-profile of the facade flush pin: times each component of
  * [[graft.api.HttpApi]]'s pinBatch over repeated snapshots so the
  * small-post ingest bound is measured, not guessed.
  *
  * Two arms over the SAME logical snapshot (soak shape: 10 samples per
  * series, `SoakBench` posts 20×10):
  *   flat   — one driver row per SAMPLE (the pre-r16 pinBatch shape):
  *            the labels map is driver-encoded, regex-validated,
  *            canonicalized and xxhash64'd once per sample;
  *   series — one driver row per SERIES with a samples array, exploded
  *            AFTER [[Ingest.ingestLabeled]] (which only touches
  *            `labels`): all per-labels work runs once per series.
  */
object PinProfile {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", 32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val nSeries = 4500 // ≈ one 45k-pt snapshot at the measured ceiling
    val perSeries = 10
    def labelsOf(i: Int) = Map(
      "__name__" -> s"fb_metric_${i % 20}",
      "instance" -> s"agent${i % 450}", "job" -> "fb",
      "__account_id" -> "tenant1")
    val flatRows = (0 until nSeries).flatMap { i =>
      (0 until perSeries).map(j =>
        (labelsOf(i), 1704067200000L + (i * perSeries + j) * 1000L,
          j.toDouble, 1L, 3155760000L))
    }
    val seriesRows = (0 until nSeries).map { i =>
      (labelsOf(i),
        (0 until perSeries).map(j =>
          (1704067200000L + (i * perSeries + j) * 1000L, j.toDouble)),
        1L, 3155760000L)
    }
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag%-24s ${(System.nanoTime() - t0) / 1e6}%8.1f ms"); r
    }
    for (round <- 1 to 6) {
      println(s"-- round $round: flat (per-sample rows)")
      val df = t("toDF") {
        flatRows.toDF("labels", "ts_ms", "value", "__seq", "__ttl_sec") }
      val ing = t("ingest-plan") {
        Ingest.ingestLabeled(df, "__account_id", "tenant1")
          .select("labels", "ts_ms", "value", "metric_id", "__seq",
            "__ttl_sec").coalesce(1) }
      val pinned = t("localCheckpoint") { ing.localCheckpoint(true) }
      t("count") { pinned.count() }

      println(s"-- round $round: series (explode after ingest)")
      val sdf = t("toDF") {
        seriesRows.toDF("labels", "samples", "__seq", "__ttl_sec") }
      val sing = t("ingest-plan") {
        Ingest.ingestLabeled(sdf, "__account_id", "tenant1")
          .select(col("labels"), explode(col("samples")).as("s"),
            col("metric_id"), col("__seq"), col("__ttl_sec"))
          .select(col("labels"), col("s._1").as("ts_ms"),
            col("s._2").as("value"), col("metric_id"), col("__seq"),
            col("__ttl_sec")).coalesce(1) }
      val spinned = t("localCheckpoint") { sing.localCheckpoint(true) }
      t("count") { spinned.count() }
    }
    spark.stop()
  }
}
