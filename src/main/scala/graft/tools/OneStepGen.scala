package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession

/** One-pass scale-up generator for single-table decade probes: replicate
  * a source table `factor`× with the SAME decorrelation [[ScaleGen]]
  * applies, but via a broadcast cross-join with `range(factor)` instead
  * of a `factor`-way plan union — at factor 10⁴ (sf0.1 → sf1000) a
  * union of 10 000 plan branches is a Catalyst stress test, while the
  * cross-join is one constant-size plan whose output streams straight
  * to parquet. Tables keep their RAW schema (events keep `ts`), so the
  * output dir is [[graft.Tables]]-compatible.
  *
  * Decorrelation per replica i > 0 (same invariants as ScaleGen):
  *  - events: id shift only (event_id += i·10¹², user_id += i·10⁹) —
  *    the series universe grows factor×, per-series history unchanged;
  *  - documents: every whitespace token suffixed `_g{i}` — cross-replica
  *    vocabulary disjoint (zero cross-replica shingle/chunk overlap),
  *    within-replica duplicate structure byte-preserved, so corpus dup
  *    DENSITY is constant and chunk/LSH candidate counts scale
  *    linearly; doc_id += i·10⁷, n_chars recomputed.
  *
  * Args: `<srcDir> <dstDir> <factor> <tablesCsv> [cpus=32]`.
  */
object OneStepGen {

  def main(args: Array[String]): Unit = {
    val srcDir = args(0)
    val dstDir = args(1)
    val factor = args(2).toInt
    val tables = args(3).split(",").toSeq
    val cpus = if (args.length > 4) args(4).toInt else 32

    val spark = GraftSession.configure(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dstDir))

    // a handful of reps per output task: each task streams its reps ×
    // base rows to its own files, so parallelism = `parts` regardless of
    // the base table's file count
    def reps(parts: Int) =
      spark.range(0, factor).repartition(parts).select(col("id").as("__rep"))

    for (t <- tables) t match {
      case "events" =>
        val base = broadcast(spark.read.parquet(s"$srcDir/events.parquet"))
        reps(cpus * 4).crossJoin(base)
          .select(
            (col("event_id") + col("__rep") * 1000000000000L)
              .as("event_id"),
            col("ts"),
            (col("user_id") + col("__rep") * 1000000000L).as("user_id"),
            col("event_type"), col("value"), col("props"))
          .write.mode(SaveMode.Overwrite)
          .parquet(s"$dstDir/events.parquet")
        System.err.println(s"[onestepgen] events ×$factor done")
      case "documents" =>
        val base = broadcast(
          spark.read.parquet(s"$srcDir/documents.parquet"))
        val txt = when(col("__rep") === 0, col("text"))
          .otherwise(array_join(
            transform(split(col("text"), " "),
              tk => concat(tk, lit("_g"), col("__rep"))), " "))
        reps(cpus * 8).crossJoin(base)
          .select(
            (col("doc_id") + col("__rep") * 10000000L).as("doc_id"),
            txt.as("text"), col("lang"), col("source"),
            length(txt).cast("long").as("n_chars"))
          .write.mode(SaveMode.Overwrite)
          .parquet(s"$dstDir/documents.parquet")
        System.err.println(s"[onestepgen] documents ×$factor done")
      case other =>
        throw new IllegalArgumentException(s"unsupported table: $other")
    }
    spark.stop()
  }
}
