package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.streaming.{Ingest, Prompb}

/** Micro-profile of the facade flush pin: times each component of
  * [[graft.api.HttpApi]]'s pinBatch over repeated snapshots so the
  * small-post ingest bound is measured, not guessed.
  */
object PinProfile {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", 32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val rows = (0 until 1600).map { i =>
      (Map("__name__" -> s"fb_metric_${i % 20}",
        "instance" -> s"agent${i % 10}", "job" -> "fb",
        "__account_id" -> "tenant1"),
        1704067200000L + i * 10000L, i.toDouble, 1L, 3155760000L)
    }
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag%-24s ${(System.nanoTime() - t0) / 1e6}%8.1f ms"); r
    }
    for (round <- 1 to 6) {
      println(s"-- round $round")
      val df = t("toDF") {
        rows.toDF("labels", "ts_ms", "value", "__seq", "__ttl_sec") }
      val ing = t("ingest-plan") {
        Ingest.ingestLabeled(df, "__account_id", "tenant1")
          .select("labels", "ts_ms", "value", "metric_id", "__seq",
            "__ttl_sec").coalesce(1) }
      val pinned = t("localCheckpoint") { ing.localCheckpoint(true) }
      t("count") { pinned.count() }
    }
    spark.stop()
  }
}
