package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.similarity.Ann

/** v10 vs v11 at production settings: both run PQ-ADC candidate
  * generation + exact rerank; v10 ([[Ann.pqAdcRerank]]) ADC-scans the
  * ENTIRE code table per query, v11 ([[Ann.ivfAdcRerank]]) prunes the
  * inverted file to each query's nProbe nearest cells first (Jégou 2011
  * §V). On a corpus whose cluster structure matches the index
  * (ClusterGen's mixture → nCells = 32, the RecallProbe sizing), the
  * expected ADC-pair reduction is ~K/nProbe; this probe MEASURES the
  * pair counts, wall times, and recall@k of both against brute force.
  *
  * Usage: IvfAdcProbe [sfDir] [nQueries] [k] [nCells] [nProbe] [m] [pqK]
  */
object IvfAdcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/benchdata/clustered")
    val nQ = args.lift(1).map(_.toInt).getOrElse(100)
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val nCells = args.lift(3).map(_.toInt).getOrElse(32)
    val nProbe = args.lift(4).map(_.toInt).getOrElse(4)
    val m = args.lift(5).map(_.toInt).getOrElse(8)
    val pqK = args.lift(6).map(_.toInt).getOrElse(16)
    val nCand = 4 * k
    val iters = 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val queries = emb.where(col("vec_id") < nQ)
    val n = emb.count()
    val dims = emb.selectExpr("size(embedding)").head().getInt(0)

    val idxPath =
      s"/tmp/graft_ivfadc_${java.lang.ProcessHandle.current.pid}"
    graft.store.Store.buildIvfIndex(spark, idxPath, emb, nCells = nCells)
    val (cells, asg) = graft.store.Store.readIvfIndex(spark, idxPath)

    def timed(f: => DataFrame): (DataFrame, Double) = {
      val t0 = System.nanoTime()
      val out = f.select("q_id", "nn_id").localCheckpoint(true)
      (out, (System.nanoTime() - t0) / 1e9)
    }
    val (truth, tBrute) = timed(Ann.bruteForceTopK(emb, queries, k))
    val truthN = truth.count()
    def recall(a: DataFrame): Double =
      a.join(truth, Seq("q_id", "nn_id")).count().toDouble / truthN

    // warmup both paths (codegen), then timed
    Ann.pqAdcRerank(emb, queries, m, dims / m, pqK, iters, nCand, k).count()
    Ann.ivfAdcRerank(emb, queries, cells, asg, m, dims / m, pqK, iters,
      nProbe, nCand, k).count()
    val (v10, tV10) = timed(
      Ann.pqAdcRerank(emb, queries, m, dims / m, pqK, iters, nCand, k))
    val (v11, tV11) = timed(Ann.ivfAdcRerank(emb, queries, cells, asg,
      m, dims / m, pqK, iters, nProbe, nCand, k))

    // ADC pair counts: v10 scores every (query, corpus) pair; v11 only
    // pairs whose corpus vector lives in a probed cell
    val pairsV10 = nQ.toLong * (n - 1)
    val cellSizes = asg.groupBy("c").agg(count(lit(1)).as("sz"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("dist"), col("c"))
    val probeList = emb.where(col("vec_id") < nQ)
      .crossJoin(broadcast(cells))
      .withColumn("dist", Ann.sqdist(
        col("embedding"), col("cen")))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= nProbe)
      .select(col("vec_id").as("q_id"), col("c"))
    val pairsV11 = probeList.join(cellSizes, "c")
      .agg(sum("sz")).head().getLong(0) - nQ // self-pairs excluded

    println(s"""{"probe":"ivfadc_vs_adc","sf":"$sfDir","n":$n,""" +
      s""""n_queries":$nQ,"k":$k,"n_cells":$nCells,"n_probe":$nProbe,""" +
      s""""m":$m,"pq_k":$pqK,"n_cand":$nCand,"brute_sec":$tBrute,""" +
      s""""v10_full_adc":{"recall":${recall(v10)},"sec":$tV10,""" +
      s""""adc_pairs":$pairsV10},""" +
      s""""v11_ivfadc":{"recall":${recall(v11)},"sec":$tV11,""" +
      s""""adc_pairs":$pairsV11},""" +
      f""""pair_reduction":${pairsV10.toDouble / pairsV11}%.2f}""")
    spark.stop()
  }
}
