package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.similarity.Ann

/** v10 vs v11 at production settings, build-once/probe-many: both run
  * PQ-ADC candidate generation + exact rerank; v10
  * ([[Ann.pqAdcRerankWith]]) ADC-scans the ENTIRE code table per query,
  * v11 ([[Ann.ivfAdcRerankWith]]) prunes the inverted file to each
  * query's nProbe nearest cells first (Jégou 2011 §V). On a corpus
  * whose cluster structure matches the index (ClusterGen's mixture →
  * nCells = 32, the RecallProbe sizing), the expected ADC-pair
  * reduction is ~K/nProbe; this probe MEASURES pair counts, wall times,
  * and recall@k of both against brute force.
  *
  * The indexes (coarse IVF cells + PQ codebooks + code table) are built
  * ONCE and pinned before any query is timed — at 100 TB they are
  * persisted artifacts amortized over every probe, so folding their
  * construction into per-query wall time (as the inline oracle entry
  * points do, to stay self-contained) would overstate query cost by a
  * large constant. Build time is reported separately.
  *
  * The shortlist width sweeps (`nCandList`): ADC ranking quality is
  * scale-sensitive — a fixed nCand that recalls well at 2k rows is far
  * too narrow at 100k (the PQ code space m=8 × pqK=16 can't separate
  * 100k vectors into a 40-row shortlist) — so the probe reports the
  * recall/latency frontier rather than one point.
  *
  * Usage: IvfAdcProbe [sfDir] [nQueries] [k] [nCells] [nProbe] [m]
  *   [pqK] [nCandList=4k,20k',100k'] [out=IVFADC_PROBE.json]
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
    val nCandList = args.lift(7).getOrElse(s"${4 * k},${20 * k},${100 * k}")
      .split(",").map(_.trim.toInt).toSeq
    val outPath = args.lift(8).getOrElse("IVFADC_PROBE.json")
    val iters = 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).localCheckpoint(true)
    val queries = emb.where(col("vec_id") < nQ)
    val n = emb.count()
    val dims = emb.selectExpr("size(embedding)").head().getInt(0)

    // ---- build phase (timed separately): IVF cells + PQ index, pinned
    val tB0 = System.nanoTime()
    val idxPath =
      s"/tmp/graft_ivfadc_${java.lang.ProcessHandle.current.pid}"
    graft.store.Store.buildIvfIndex(spark, idxPath, emb, nCells = nCells)
    val (cells, asg) = graft.store.Store.readIvfIndex(spark, idxPath)
    val (cens, codes0) = Ann.pqIndex(emb, m, dims / m, pqK, iters)
    val codes = codes0.localCheckpoint(true) // the persisted code table
    val tBuild = (System.nanoTime() - tB0) / 1e9
    // the residual-encoded PQ index (v14, Jégou eq. 12-14) — same code
    // budget (m × pqK), codebooks trained on x − centroid(cell)
    val tR0 = System.nanoTime()
    val (censR, codesR0) =
      Ann.pqIndexResidual(emb, cells, asg, m, dims / m, pqK, iters)
    val codesR = codesR0.localCheckpoint(true)
    val tBuildR = (System.nanoTime() - tR0) / 1e9

    def timed(f: => DataFrame): (DataFrame, Double) = {
      val t0 = System.nanoTime()
      val out = f.select("q_id", "nn_id").localCheckpoint(true)
      (out, (System.nanoTime() - t0) / 1e9)
    }
    val (truth, tBrute) = timed(Ann.bruteForceTopK(emb, queries, k))
    val truthN = truth.count()
    def recall(a: DataFrame): Double =
      a.join(truth, Seq("q_id", "nn_id")).count().toDouble / truthN

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

    // warmup both paths (codegen) at the narrowest shortlist
    Ann.pqAdcRerankWith(emb, queries, codes, cens, dims / m,
      nCandList.head, k).count()
    Ann.ivfAdcRerankWith(emb, queries, cells, asg, codes, cens, dims / m,
      nProbe, nCandList.head, k).count()
    Ann.ivfAdcResidualRerankWith(emb, queries, cells, asg, codesR, censR,
      dims / m, nProbe, nCandList.head, k).count()

    // budget-adaptive multi-probe sweep (v15): budgets expressed as
    // nProbe-EQUIVALENTS of average cell mass (n·np/K), so each row is
    // directly comparable to a fixed-nProbe row at the same expected
    // pair count — the question the sweep answers is whether moving
    // probe mass from dense-cell queries to boundary queries buys
    // recall at equal ADC work. Pairs are measured, not assumed: the
    // probe list joins the real (skewed) cell sizes.
    val budgetSweep = Seq(2, 4, 6, 8).flatMap { npEq =>
      val budget = n * npEq / nCells
      val probesB = Ann.probeCellsBudget(queries, cells, asg, budget)
        .localCheckpoint(true)
      val pairsB = probesB.join(cellSizes, "c")
        .agg(sum("sz")).head().getLong(0) - nQ
      val cellsPerQ = probesB.count().toDouble / nQ
      nCandList.map { nCand =>
        val (v15, tV15) = timed(Ann.ivfAdcResidualRerankBudgetWith(
          emb, queries, cells, asg, codesR, censR, dims / m, budget,
          nCand, k))
        s"""{"np_equiv":$npEq,"budget":$budget,"adc_pairs":$pairsB,""" +
          f""""cells_per_query":$cellsPerQ%.2f,"n_cand":$nCand,""" +
          s""""recall":${recall(v15)},"sec":$tV15}"""
      }
    }

    val sweep = nCandList.map { nCand =>
      val (v10, tV10) = timed(Ann.pqAdcRerankWith(
        emb, queries, codes, cens, dims / m, nCand, k))
      val (v11, tV11) = timed(Ann.ivfAdcRerankWith(
        emb, queries, cells, asg, codes, cens, dims / m, nProbe, nCand, k))
      val (v14, tV14) = timed(Ann.ivfAdcResidualRerankWith(
        emb, queries, cells, asg, codesR, censR, dims / m, nProbe, nCand, k))
      s"""{"n_cand":$nCand,""" +
        s""""v10_full_adc":{"recall":${recall(v10)},"sec":$tV10},""" +
        s""""v11_ivfadc":{"recall":${recall(v11)},"sec":$tV11},""" +
        s""""v14_ivfadc_residual":{"recall":${recall(v14)},"sec":$tV14}}"""
    }

    val json =
      s"""{"probe":"ivfadc_vs_adc","sf":"$sfDir","n":$n,""" +
        s""""n_queries":$nQ,"k":$k,"n_cells":$nCells,"n_probe":$nProbe,""" +
        s""""m":$m,"pq_k":$pqK,"index_build_sec":$tBuild,""" +
        s""""residual_index_build_sec":$tBuildR,""" +
        s""""brute_sec":$tBrute,"adc_pairs_v10":$pairsV10,""" +
        s""""adc_pairs_v11":$pairsV11,""" +
        f""""pair_reduction":${pairsV10.toDouble / pairsV11}%.2f,""" +
        s""""sweep":[${sweep.mkString(",")}],""" +
        s""""budget_sweep":[${budgetSweep.mkString(",")}]}"""
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
