package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

import graft.GraftSession
import graft.similarity.Ann

/** IVF index lifecycle under churn (VERDICT r13 #6): v12 upserts assign
  * new vectors against a FROZEN quantizer — the FAISS `IndexIVF.add`
  * discipline — and nothing so far measured what sustained drift does
  * to that index. This probe ingests `rounds` upsert batches drawn from
  * a DRIFTING distribution (each round's vectors contract toward a
  * moving offset: `x·0.5 + drift(round)`, a dense region the original
  * quantizer never saw), and after each round records:
  *
  *  - `recall_frozen`: recall@k of the frozen-quantizer index on the
  *    CURRENT corpus (queries sampled from both old and new regions);
  *  - `recall_retrain`: the same search against a quantizer retrained
  *    from scratch on the current corpus — the offline rebuild v12's
  *    scaladoc prescribes, priced here;
  *  - `max_med_ratio`: max/median inverted-list size — the balance
  *    statistic a deployment can watch WITHOUT running a recall probe
  *    (recall needs ground truth; list sizes are free at write time);
  *  - `retrain_sec`: what the rebuild costs when triggered.
  *
  * The documented trigger derives from the curve this emits: retrain
  * when max/median exceeds the knee where frozen recall visibly parts
  * from retrain recall. Reference shape:
  * `squirreldb-cassandra-index-bench`'s churn discipline (sustained
  * insert + verify cycles against one index).
  *
  * Usage: IvfChurnProbe [sfDir] [rounds] [deltaPerRound] [nQ] [k]
  *   [nCells] [nProbe] [out=IVF_CHURN.json]
  */
object IvfChurnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/benchdata/clustered100k")
    val rounds = args.lift(1).map(_.toInt).getOrElse(5)
    val deltaN = args.lift(2).map(_.toInt).getOrElse(20000)
    val nQ = args.lift(3).map(_.toInt).getOrElse(100)
    val k = args.lift(4).map(_.toInt).getOrElse(10)
    val nCells = args.lift(5).map(_.toInt).getOrElse(32)
    val nProbe = args.lift(6).map(_.toInt).getOrElse(4)
    val outPath = args.lift(7).getOrElse("IVF_CHURN.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).localCheckpoint(true)
    val baseN = base.count()

    val idxPath =
      s"/tmp/graft_ivfchurn_${java.lang.ProcessHandle.current.pid}"
    graft.store.Store.buildIvfIndex(spark, idxPath, base, nCells)
    // the WIRED-trigger twin (r14): same base index, but every upsert
    // passes the corpus handle so Store's balance check can fire the
    // auto-retrain at the default threshold (16, the r13-measured knee)
    // — this probe run is the evidence the trigger fires where the
    // curve said it should, and that the live index's recall rejoins
    // the retrained ceiling when it does
    val idxAuto = idxPath + "_auto"
    graft.store.Store.buildIvfIndex(spark, idxAuto, base, nCells)

    def recallOf(corpus: DataFrame, queries: DataFrame, cells: DataFrame,
        asg: DataFrame): Double = {
      val truth = Ann.bruteForceTopK(corpus, queries, k)
        .select("q_id", "nn_id").localCheckpoint(true)
      val got = Ann.ivfTopK(corpus, queries, k, cells, asg, nProbe)
        .select("q_id", "nn_id")
      got.join(truth, Seq("q_id", "nn_id")).count().toDouble / truth.count()
    }

    var corpus = base
    val lines = (1 to rounds).map { r =>
      // the drifting delta: round r's vectors contract toward offset
      // 0.15·r on every dim — a moving dense region the frozen
      // centroids cover progressively worse (deterministic, no RNG)
      val drift = 0.15 * r
      val delta = base.where(col("vec_id") % lit(rounds) === lit(r - 1))
        .limit(deltaN)
        .select(
          (col("vec_id") + lit(1000000L * r)).as("vec_id"),
          transform(col("embedding"),
            x => (x * 0.5 + drift).cast("float")).as("embedding"))
        .localCheckpoint(true)
      require(graft.store.Store.upsertIvfIndex(spark, idxPath, delta,
        s"churn_r$r"), s"round $r upsert must commit")
      corpus = corpus.unionByName(delta).localCheckpoint(true)
      require(graft.store.Store.upsertIvfIndex(spark, idxAuto, delta,
        s"churn_r$r", retrainCorpus = Some(corpus)),
        s"round $r auto upsert must commit")
      val (cells, asg) = graft.store.Store.readIvfIndex(spark, idxPath)
      // queries: half from the original corpus, half from the drifted
      // region — recall is measured where the index is weakest too
      val queries = base.where(col("vec_id") < nQ / 2).unionByName(
        delta.limit(nQ / 2)).localCheckpoint(true)
      val sizes = asg.groupBy("c").agg(count(lit(1)).as("n"))
        .select("n").collect().map(_.getLong(0)).sorted
      val maxMed = sizes.max.toDouble / sizes(sizes.length / 2)
      val rFrozen = recallOf(corpus, queries, cells, asg)
      // the offline rebuild: fresh quantizer on the current corpus
      val t0 = System.nanoTime()
      val freshPath = s"${idxPath}_fresh_r$r"
      graft.store.Store.buildIvfIndex(spark, freshPath, corpus, nCells)
      val retrainSec = (System.nanoTime() - t0) / 1e9
      val (fc, fa) = graft.store.Store.readIvfIndex(spark, freshPath)
      val rRetrain = recallOf(corpus, queries, fc, fa)
      // the wired twin: how many retrain generations the trigger has
      // committed so far, its live balance, and its live recall (after
      // a fire, readIvfIndex serves the retrained root)
      val autoRetrains = java.nio.file.Files.list(
          java.nio.file.Paths.get(idxAuto)).iterator().asScala
        .count(_.getFileName.toString.startsWith("retrain_"))
      val autoBalance = graft.store.Store.ivfCellBalance(spark, idxAuto)
      val (ac, aa) = graft.store.Store.readIvfIndex(spark, idxAuto)
      val rAuto = recallOf(corpus, queries, ac, aa)
      val line =
        f"""{"round":$r,"corpus_n":${baseN + r.toLong * deltaN},""" +
          f""""max_med_ratio":$maxMed%.2f,"recall_frozen":$rFrozen%.3f,""" +
          f""""recall_retrain":$rRetrain%.3f,"retrain_sec":$retrainSec%.1f,""" +
          f""""auto_retrains":$autoRetrains,"auto_balance":$autoBalance%.2f,""" +
          f""""recall_auto":$rAuto%.3f}"""
      System.err.println(s"[churn] $line")
      line
    }

    // final-round frontier under REAL skew (r14, the multi-probe case
    // the clustered100k sweep could not show — its max/med is mild):
    // on the FROZEN index the drift just unbalanced, compare fixed
    // nProbe against the budget rule at equal nProbe-equivalents.
    // Pairs are measured from the actual probe lists.
    val (fzC, fzA) = graft.store.Store.readIvfIndex(spark, idxPath)
    val fzSizes = fzA.groupBy("c").agg(count(lit(1)).as("sz"))
      .localCheckpoint(true)
    val finalQ = base.where(col("vec_id") < nQ / 2).unionByName(
      corpus.where(col("vec_id") >= 1000000L * rounds).limit(nQ / 2))
      .localCheckpoint(true)
    val truthF = Ann.bruteForceTopK(corpus, finalQ, k)
      .select("q_id", "nn_id").localCheckpoint(true)
    val truthFN = truthF.count()
    val finalN = corpus.count()
    import org.apache.spark.sql.expressions.Window
    val skewLines = Seq(nProbe, nProbe * 2).flatMap { np =>
      val w = Window.partitionBy("vec_id").orderBy(col("dist"), col("c"))
      val fixedProbes = finalQ.crossJoin(broadcast(fzC))
        .withColumn("dist", Ann.sqdist(col("embedding"), col("cen")))
        .withColumn("__rn", row_number().over(w))
        .where(col("__rn") <= np)
        .select(col("vec_id").as("q_id"), col("c"))
        .localCheckpoint(true)
      val budget = finalN * np / nCells
      val budgetProbes = Ann.probeCellsBudget(finalQ, fzC, fzA, budget)
        .localCheckpoint(true)
      // the skew guard: same budget, but at least np distance-ranked
      // cells probe regardless of how much mass the first ones hold —
      // the r14 floor that stops a drift-fattened giant cell from
      // consuming the whole budget on one probe
      val floorProbes = Ann.probeCellsBudget(finalQ, fzC, fzA, budget,
        "vec_id", np).localCheckpoint(true)
      Seq(("fixed", fixedProbes, np.toLong),
          ("budget", budgetProbes, budget),
          ("budget_floor", floorProbes, budget)).map {
        case (kind, pl, parm) =>
        val pairs = pl.join(fzSizes, "c").agg(sum("sz")).head().getLong(0)
        val rec = Ann.ivfTopKProbes(corpus, finalQ, k, fzA, pl)
          .select("q_id", "nn_id")
          .join(truthF, Seq("q_id", "nn_id")).count().toDouble / truthFN
        f"""{"kind":"$kind","np_equiv":$np,"param":$parm,""" +
          f""""adc_pairs":$pairs,"recall":$rec%.3f}"""
      }
    }

    val json =
      s"""{"probe":"ivf_churn","sf":"$sfDir","base_n":$baseN,""" +
        s""""rounds":$rounds,"delta_per_round":$deltaN,""" +
        s""""n_queries":$nQ,"k":$k,"n_cells":$nCells,"n_probe":$nProbe,""" +
        s""""rounds_data":[${lines.mkString(",")}],""" +
        s""""skew_frontier":[${skewLines.mkString(",")}]}"""
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
