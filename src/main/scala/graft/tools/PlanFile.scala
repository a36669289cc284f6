package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.{GraftSession, SparkEntry}

/** Dump `explain("formatted")` of named SparkEntry queries to one file
  * each — the per-query before/after plan evidence of an optimization
  * round (`plans/rNN/<query>_{before,after}.txt`). Unlike
  * [[ExplainDump]] (the fixed headline set into PLANS.md), this takes
  * the query list and output directory from the command line.
  *
  * Usage: PlanFile <outDir> <suffix> <sfDir> <query> [query ...]
  */
object PlanFile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: PlanFile <outDir> <suffix> <sfDir> <query> [query ...]")
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val sfDir = args(2)
    val names = args.drop(3).toSeq
    Files.createDirectories(outDir)
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val p = outDir.resolve(s"${name}_$suffix.txt")
      Files.writeString(p, plan)
      println(s"wrote $p")
    }
    spark.stop()
  }
}
