package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.similarity.Ann

/** ANN quality probe: recall@k of each approximate index (SRP-LSH, IVF,
  * PQ-ADC) against the brute-force ground truth, on the real embeddings
  * table at a given scale. The correctness gate (v1-v3, v8/v9) proves
  * each method computes ITS OWN semantics exactly; this probe measures
  * the quality/cost trade each approximation buys — the number a user
  * sizing nProbe / nPlanes / codebook bits actually needs ("measure,
  * don't guess"). Local iteration aid — not part of the driver contract.
  *
  * Recall@k = |approx top-k ∩ exact top-k| / k, averaged over queries
  * (standard ANN-benchmarks definition). Methods that miss a bucket
  * return fewer than k rows and lose recall accordingly — that IS the
  * trade being measured. Also reports each method's wall time on the
  * same session (warm), brute included as the cost baseline.
  *
  * Usage: RecallProbe [sfDir] [nQueries] [k] [nCells]
  * (nCells sizes the IVF index — on clustered corpora set it to the
  * expected cluster count; the probe also reports nProbe=8 and a
  * 32-bit PQ so the sizing sweep brackets the recall@10 ≥ 0.9 target)
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nQ = args.lift(1).map(_.toInt).getOrElse(100)
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val nCells = args.lift(3).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val queries = emb.where(col("vec_id") < nQ)

    def timed(f: => DataFrame): (DataFrame, Double) = {
      val t0 = System.nanoTime()
      val df = f
      val out = df.select("q_id", "nn_id").localCheckpoint(true)
      ((out, (System.nanoTime() - t0) / 1e9))
    }

    val (truth, tBrute) = timed(Ann.bruteForceTopK(emb, queries, k))
    val truthN = truth.count()

    def recall(approx: DataFrame): Double = {
      val hits = approx.join(truth, Seq("q_id", "nn_id")).count()
      hits.toDouble / truthN
    }

    val (lsh, tLsh) = timed(Ann.lshTopK(emb, queries, k, nPlanes = 8))
    val idxPath = s"/tmp/graft_recall_ivf_${java.lang.ProcessHandle.current.pid}"
    graft.store.Store.buildIvfIndex(spark, idxPath, emb, nCells = nCells)
    val (cells, asg) = graft.store.Store.readIvfIndex(spark, idxPath)
    val (ivf1, tIvf1) = timed(Ann.ivfTopK(emb, queries, k, cells, asg, nProbe = 1))
    val (ivf2, tIvf2) = timed(Ann.ivfTopK(emb, queries, k, cells, asg, nProbe = 2))
    val (ivf4, tIvf4) = timed(Ann.ivfTopK(emb, queries, k, cells, asg, nProbe = 4))
    val (ivf8, tIvf8) = timed(Ann.ivfTopK(emb, queries, k, cells, asg, nProbe = 8))
    val dims = emb.selectExpr("size(embedding)").head().getInt(0)
    val (pq, tPq) = timed(Ann.pqAdcTopK(emb, queries,
      m = 4, subDim = dims / 4, k = 8, iters = 2, topK = k))
    val (pq32, tPq32) = timed(Ann.pqAdcTopK(emb, queries,
      m = 8, subDim = dims / 8, k = 16, iters = 2, topK = k))

    val json =
      s"""{"sf":"$sfDir","n_queries":$nQ,"k":$k,"n_cells":$nCells,""" +
        s""""brute_sec":$tBrute,""" +
        s""""lsh8":{"recall":${recall(lsh)},"sec":$tLsh},""" +
        s""""ivf_p1":{"recall":${recall(ivf1)},"sec":$tIvf1},""" +
        s""""ivf_p2":{"recall":${recall(ivf2)},"sec":$tIvf2},""" +
        s""""ivf_p4":{"recall":${recall(ivf4)},"sec":$tIvf4},""" +
        s""""ivf_p8":{"recall":${recall(ivf8)},"sec":$tIvf8},""" +
        s""""pq_adc_m4k8":{"recall":${recall(pq)},"sec":$tPq},""" +
        s""""pq_adc_m8k16":{"recall":${recall(pq32)},"sec":$tPq32}}"""
    println(json)
    spark.stop()
  }
}
