package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftSession, SparkEntry, Tables}

/** The x16 fourth-decade spill-wall attribution probe (VERDICT r15
  * task 2 / r14 "What's missing"): at sf1000 the chunk-dedup's
  * corpus-sized shuffles spilled ~70 GB on one 32-core box and ran
  * 3.3× over the linear bar, because the pin, the frequency groupBy,
  * and the join-back all carried the raw ~12-token chunk STRING. The
  * escape is the key, not the memory: dedup on the chunk's md5 digest
  * computed map-side inside the explode (d97b2e4) and the text never
  * leaves the scan stage — only 32-byte keys shuffle.
  *
  * This probe runs BOTH formulations over the SAME corpus so the fix
  * is attributed on one data point instead of across two differently
  * generated corpora (r14's sf1000 chain was rebuilt for r16):
  *
  *  - `digest` arm: the EXACT suite query (`SparkEntry
  *    .queries("x16_chunk_dedup")`) — what HEAD ships;
  *  - `text` arm: the pre-d97b2e4 formulation inlined here verbatim
  *    (pin/groupBy/join on the chunk string), the probe's baseline;
  *  - both arms fingerprinted order-independently (sum + xor of
  *    xxhash64 over all four output columns — integers and a bool, so
  *    equality is EXACT, no quantization caveat) with the hash fused
  *    into the measured aggregate (the A1LayoutProbe discipline: a
  *    separate fingerprint pass would re-pay the arm's whole shuffle).
  *
  * One arm per PROCESS (`mode` arg) — the text arm's spill plus the
  * digest arm's pin on one disk is the exact footprint the wall is
  * about; a shared session would also share staged pins. Each run
  * prints a machine-readable `[chunkkey-result]` line; the caller
  * assembles the SCALE artifact.
  *
  * Args: `<sfDir> <mode: digest|text> [cpus=32] [shuffleParts=cpus]` —
  * `shuffleParts` exists because partition SIZING is part of the claim
  * under test: a 0.25 B-key aggregate in `cpus` partitions carries
  * ~1 GB of hash-map state per task and spills structurally; at the
  * partition count a deployment would size (state per task ≲ a few
  * hundred MB) the same plan runs in memory. Both counts are probed.
  */
object ChunkKeyProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val mode = args(1)
    val cpus = if (args.length > 2) args(2).toInt else 32
    val shuffleParts = if (args.length > 3) args(3).toInt else cpus

    val spark = GraftSession.configure(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", shuffleParts))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val spillMem = new AtomicLong
    val spillDisk = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          spillMem.addAndGet(m.memoryBytesSpilled)
          spillDisk.addAndGet(m.diskBytesSpilled)
        }
      }
    })

    // the suite corpus: PipelineQueries.corpus's planted-duplicate
    // augmentation, reproduced here because the probe's text arm needs
    // the frame WITHOUT going through the (digest-keyed) suite query —
    // kept in lockstep with PipelineQueries.corpus
    def corpus: DataFrame = {
      val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      docs
        .unionByName(docs.where(col("doc_id") < 50)
          .withColumn("doc_id", col("doc_id") + 10000))
        .unionByName(docs.where(col("doc_id") >= 50 && col("doc_id") < 80)
          .withColumn("doc_id", col("doc_id") + 20000)
          .withColumn("text", concat(col("text"), lit(" extra tail"))))
    }

    // pre-d97b2e4 chunkDedup, verbatim: every stage past the explode
    // carries the chunk STRING
    def textKeyed(docs: DataFrame): DataFrame = {
      val toks = split(col("text"), " ")
      val k = graft.queries.PipelineQueries.ChunkTokens
      val nChunks = greatest(
        ((size(toks) + lit(k - 1)) / lit(k)).cast("int"), lit(1))
      val chunks = transform(sequence(lit(1), nChunks),
        g => array_join(
          slice(toks, (g - lit(1)) * lit(k) + lit(1), lit(k)), " "))
      val e = graft.store.Stage.pin(docs
        .select(col("doc_id"),
          explode(array_distinct(chunks)).as("chunk")),
        "chunk-pairs-text")
      val df = e.groupBy("chunk").agg(count(lit(1)).as("__df"))
      e.join(df, Seq("chunk"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("__df") >= 2, 1L).otherwise(0L))
            .as("n_dup_chunks"))
        .withColumn("keep", col("n_dup_chunks") * 2 < col("n_chunks"))
        .select(col("doc_id"), col("n_chunks"), col("n_dup_chunks"),
          col("keep"))
    }

    val arm: DataFrame = mode match {
      case "digest" => SparkEntry.queries("x16_chunk_dedup")(spark, sfDir)
      case "text" => textKeyed(corpus)
      case other => throw new IllegalArgumentException(
        s"mode must be digest|text, got $other")
    }

    // fused timing + exact order-independent fingerprint
    val h = arm.select(xxhash64(col("doc_id"), col("n_chunks"),
      col("n_dup_chunks"), col("keep")).as("h"))
    val t0 = System.nanoTime()
    val r = h.agg(sum(col("h").cast("decimal(38,0)")).as("s"),
      expr("bit_xor(h)").as("x"), count(lit(1)).as("c")).head()
    val sec = (System.nanoTime() - t0) / 1e9
    val fpSum = if (r.isNullAt(0)) "0" else r.getDecimal(0).toPlainString
    val fpXor = if (r.isNullAt(1)) 0L else r.getLong(1)
    val n = r.getLong(2)

    println(f"""[chunkkey-result] {"mode":"$mode","sfDir":"$sfDir",""" +
      f""""cpus":$cpus,"shuffle_parts":$shuffleParts,""" +
      f""""sec":$sec%.1f,"spill_mem":${spillMem.get},""" +
      f""""spill_disk":${spillDisk.get},"fp_sum":"$fpSum",""" +
      f""""fp_xor":$fpXor,"rows":$n}""")
    spark.stop()
  }
}
