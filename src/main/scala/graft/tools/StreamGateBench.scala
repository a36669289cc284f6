package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.streaming.{StreamDedup, StreamNearDup}

/** Throughput probe for the two streaming ingest gates: feeds the
  * documents table (plus planted duplicate replicas, like the batch
  * corpus) through [[StreamDedup]] (exact digest) and
  * [[StreamNearDup]] (MinHash-LSH) in micro-batches via MemoryStream,
  * measuring docs/s end-to-end — state updates, watermark advance, and
  * (for the LSH gate) the foreachBatch survivor reduction included.
  *
  * Env: SGB_BATCH (docs per micro-batch, default 5000), SGB_SF_DIR,
  * SPARK_GRAFT_CPUS. One JSON line to stdout and SGB_OUT.
  */
object StreamGateBench {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SGB_SF_DIR", "/root/testdata/sf0.1")
    val batchSize = sys.env.getOrElse("SGB_BATCH", "5000").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // the batch corpus's planted-duplicate shape: full re-crawls of the
    // first 50 ids plus prefix-duplicates of 50-79, stamped with event
    // times that advance ~1s per doc so the watermark moves naturally
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val corpus = docs
      .unionByName(docs.where(col("doc_id") < 50)
        .withColumn("doc_id", col("doc_id") + 10000000L))
      .unionByName(docs.where(col("doc_id") >= 50 && col("doc_id") < 80)
        .withColumn("doc_id", col("doc_id") + 20000000L)
        .withColumn("text", concat(col("text"), lit(" extra tail"))))
      .withColumn("tsMs", lit(1704067200000L) + col("doc_id") % 100000L)
      .select(col("doc_id").as("docId"), col("text"), col("tsMs"))
      .as[StreamNearDup.Doc].collect()
    val n = corpus.length

    def feed[T](mkQuery: MemoryStream[StreamNearDup.Doc] =>
        (org.apache.spark.sql.streaming.StreamingQuery, () => Long))
        : (Double, Long) = {
      val input = MemoryStream[StreamNearDup.Doc]
      val (q, survivors) = mkQuery(input)
      val t0 = System.nanoTime()
      try {
        corpus.grouped(batchSize).foreach { b =>
          input.addData(b.toIndexedSeq); q.processAllAvailable()
        }
        ((System.nanoTime() - t0) / 1e9, survivors())
      } finally q.stop()
    }

    // state partition count applies to BOTH gates (ADVICE r13: set
    // between them, the two docs/s in one JSON ran at different state
    // parallelism and were not comparable): streaming state parallelism
    // is fixed at query start from shuffle.partitions; N partitions ×
    // per-trigger commit overhead dominates small batches
    val stateParts = sys.env.getOrElse("SGB_STATE_PARTS", cpus).toInt
    spark.conf.set("spark.sql.shuffle.partitions", stateParts)

    // exact digest gate
    val (tD, survD) = feed { input =>
      val counter = new java.util.concurrent.atomic.AtomicLong
      val q = StreamDedup(
        input.toDS().map(d => StreamDedup.Doc(d.docId, d.text, d.tsMs)),
        delayMs = 3600000L)
        .writeStream.outputMode("append")
        .foreachBatch { (b: DataFrame, _: Long) =>
          counter.addAndGet(b.count()); ()
        }.start()
      (q, () => counter.get)
    }

    // attribution phase 1 — the HASH CEILING: the same corpus through
    // the identical signature/band COLUMN pipeline as a plain batch
    // projection (no state store, no micro-batch machinery). The gap
    // between this and the gate below is what streaming state costs.
    import graft.dedup.Dedup
    val tS0 = System.nanoTime()
    val sigRows = spark.createDataset(corpus.toIndexedSeq)
      .repartition(cpus.toInt) // a LocalTableScan would underparallelize
      .toDF()
      .withColumn("xs", Dedup.xsCol(col("text"), 3))
      .select(col("docId") +: col("xs") +: Dedup.sigNamedCols(16): _*)
      .select(col("docId"),
        posexplode(when(size(col("xs")) > 0,
          array(Dedup.bandDigestCols(16, 4): _*))
          .otherwise(array(concat(lit("solo:"),
            col("docId").cast("string"))))))
      .count()
    val tSig = (System.nanoTime() - tS0) / 1e9

    // LSH near-dup gate (verdicts + batch-local survivor reduction).
    // SGB_LSH_MODE attribution variants (default "full"):
    //   raw       — count verdict rows, skip the survivorsBatch groupBy
    //               (prices the per-trigger foreachBatch reduction)
    //   verdicts0 — run the band pipeline WITHOUT the state operator
    //               (prices hash + typed combine + payload union; the
    //               gap to "raw" is the state exchange itself)
    val lshMode = sys.env.getOrElse("SGB_LSH_MODE", "full")
    val (tL, survL) = feed { input =>
      val counter = new java.util.concurrent.atomic.AtomicLong
      val stream = lshMode match {
        case "verdicts0" => StreamNearDup.verdictsStateless(input.toDS())
        case _ => StreamNearDup.verdicts(input.toDS(), delayMs = 3600000L)
      }
      val q = stream
        .writeStream.outputMode("append")
        .foreachBatch { (b: DataFrame, _: Long) =>
          counter.addAndGet(
            if (lshMode == "full") StreamNearDup.survivorsBatch(b).count()
            else b.count())
          ()
        }.start()
      (q, () => counter.get)
    }

    val json =
      s"""{"probe":"stream_gate_throughput","sf":"$sfDir","docs":$n,""" +
        s""""batch":$batchSize,"state_parts":$stateParts,""" +
        s""""sig_batch_sec":$tSig,"sig_batch_docs_per_s":${n / tSig},""" +
        s""""digest_sec":$tD,"digest_docs_per_s":${n / tD},""" +
        s""""digest_survivors":$survD,""" +
        s""""lsh_mode":"$lshMode",""" +
        s""""lsh_sec":$tL,"lsh_docs_per_s":${n / tL},""" +
        s""""lsh_survivors":$survL}"""
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get(
      sys.env.getOrElse("SGB_OUT", "STREAM_GATE_BENCH.json")),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
