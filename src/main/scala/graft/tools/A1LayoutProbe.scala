package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.Tables

/** The r14 fourth-decade spill-wall escape for A1, demonstrated
  * (VERDICT r15 task 3): at sf1000 the 1 B-event downsample's
  * (series, bucket) shuffle spilled 97 GB on one 32-core box and ran
  * 2.1× over its linear bar. The escape is LAYOUT, not code — persist
  * events series-bucketed at ingest ([[graft.store.Store
  * .writeBucketedPoints]], SURVEY §4.1's prescription) and the shuffle
  * does not exist: the groupBy's clustering requirement is satisfied
  * straight off the bucketed scan.
  *
  * Steps (args: `<eventsSrcDir> <workDir> [factor=1] [nBuckets=256]
  * [cpus=32]`):
  *
  *  1. replicate the source events `factor`× in ONE pass (id-shifted
  *     replicas via a broadcast cross-join with `range(factor)` — the
  *     same decorrelation ScaleGen applies to events: the series
  *     universe grows factor×, per-series history unchanged), writing
  *     `workDir/events.parquet` — the PLAIN layout;
  *  2. write the same rows through `writeBucketedPoints` — the
  *     BUCKETED layout (this is the ingest-time cost a deployment pays
  *     once, reported separately);
  *  3. run the EXACT a1_downsample_5m aggregate over both layouts,
  *     timed, with per-layout shuffle-spill bytes from a TaskEnd
  *     listener; assert the bucketed plan contains NO Exchange;
  *  4. fingerprint both results two ways: over the order-independent
  *     columns (series, bucket, min, max, count) — must match EXACTLY —
  *     and over everything incl. `avg` quantized at 1e-3 (avg is an
  *     IEEE double mean, so the two layouts' different add orders can
  *     legitimately flip a 6th-decimal rounding boundary on a handful
  *     of groups; the probe proves layout-equality, not sum
  *     determinism — `Compiler.sumDet` owns that for the query layer).
  *
  * One JSON line to stdout and to `A1_LAYOUT_OUT`
  * (default SCALE_sf1000_a1bucketed.json).
  */
object A1LayoutProbe {

  def main(args: Array[String]): Unit = {
    val srcDir = args(0)
    val workDir = args(1)
    val factor = if (args.length > 2) args(2).toInt else 1
    val nBuckets = if (args.length > 3) args(3).toInt else 256
    val cpus = if (args.length > 4) args(4).toInt else 32
    // "all" = both layouts in one session (small-scale smoke);
    // "bucketed" / "plain" = one layout per PROCESS — at 1 B rows one
    // session cannot host the bucketed write's shuffle files plus the
    // plain pass's ~30 GB of map outputs + spill on this disk, and a
    // late failure loses the earlier pass's fingerprints. Split runs
    // print a machine-readable [a1layout-result] line each; the caller
    // assembles the artifact.
    val mode = if (args.length > 5) args(5) else "all"
    val out = sys.env.getOrElse("A1_LAYOUT_OUT",
      "SCALE_sf1000_a1bucketed.json")

    val spark = GraftSession.configure(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.warehouse.dir", s"$workDir/warehouse"))
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
    def timed[A](f: => A): (A, Double, Long, Long) = {
      val m0 = spillMem.get; val d0 = spillDisk.get
      val t0 = System.nanoTime()
      val a = f
      ((a, (System.nanoTime() - t0) / 1e9,
        spillMem.get - m0, spillDisk.get - d0))
    }

    // ---- 1. plain layout ----
    // factor == 1: read the source dir directly through Tables (the
    // exact frame the bench's a1 runs over — its ts→ts_ms cast is
    // codegen'd arithmetic, immaterial next to the shuffle under test);
    // factor > 1: materialize a replicated copy first (small-scale
    // self-contained runs)
    val plainPath = s"$workDir/events.parquet"
    val genSec =
      if (factor == 1 || java.nio.file.Files.isDirectory(
          java.nio.file.Paths.get(plainPath))) 0.0
      else {
        val base = Tables.points(spark, srcDir)
        val (_, sec, _, _) = timed {
          base
            .crossJoin(broadcast(
              spark.range(0, factor).select(col("id").as("__rep"))))
            .select(
              (col("event_id") + col("__rep") * 1000000000000L)
                .as("event_id"),
              (col("user_id") + col("__rep") * 1000000000L).as("user_id"),
              col("event_type"), col("ts_ms"), col("value"))
            .write.mode(SaveMode.Overwrite).parquet(plainPath)
        }
        sec
      }
    val plain =
      if (factor == 1) Tables.points(spark, srcDir)
      else spark.read.parquet(plainPath)
    System.err.println(f"[a1layout] plain gen ${genSec}%.1fs rows=" +
      plain.count())

    // ---- 2. bucketed layout (the once-per-ingest cost) ----
    val bucketWriteSec =
      if (mode == "plain") 0.0
      else {
        val (_, sec, _, _) = timed {
          graft.store.Store.writeBucketedPoints(plain, "events_bucketed",
            s"$workDir/events_bucketed", Seq("user_id", "event_type"),
            nBuckets, Seq("user_id", "event_type", "ts_ms"))
        }
        System.err.println(f"[a1layout] bucketed write $sec%.1fs")
        sec
      }
    // the write's ~input-sized shuffle files live until the dependency
    // is GC'd; at 1 B rows leaving them around ran the disk out under
    // the plain pass's own spill — nudge the ContextCleaner now
    def reclaimShuffles(): Unit = { System.gc(); Thread.sleep(8000) }
    reclaimShuffles()

    // the EXACT a1_downsample_5m shape (TsdbQueries) over a point frame
    def a1(pts: DataFrame): DataFrame =
      graft.tsdb.Downsample(pts,
          Seq(col("user_id"), col("event_type")), col("ts_ms"),
          col("value"))
        .select(col("user_id"), col("event_type"), col("bucket_ms"),
          col("min").as("min_v"), col("max").as("max_v"),
          round(col("avg"), 6).as("avg_v"), col("count").as("n"))

    // ---- 3.+4. timed single-pass runs, fingerprint FUSED into the
    // measured aggregate (r14's passes=0 budget-mode shape): at 1 B
    // rows a separate warmup + count + fingerprint pass tripled the
    // shuffle/spill footprint and ran the disk out — one execution per
    // layout computes timing, spill bytes, AND both layout-equality
    // fingerprints (exact over the order-independent columns; avg
    // quantized at 1e-3 — an IEEE mean's add order legitimately differs
    // across layouts). The hash projection adds the same constant work
    // to both layouts, so the plain/bucketed comparison stays fair.
    def run(tag: String, pts: DataFrame):
        (Double, Long, Long, String, String, Long) = {
      val df = a1(pts)
      val h = df.select(
        xxhash64(col("user_id"), col("event_type"), col("bucket_ms"),
          col("min_v"), col("max_v"), col("n")).as("hoi"),
        xxhash64(col("user_id"), col("event_type"), col("bucket_ms"),
          col("min_v"), col("max_v"), round(col("avg_v"), 3),
          col("n")).as("hq"))
      val (r, sec, sm, sd) = timed(
        h.agg(sum(col("hoi").cast("decimal(38,0)")).as("soi"),
          sum(col("hq").cast("decimal(38,0)")).as("sq"),
          count(lit(1)).as("c")).head())
      System.err.println(f"[a1layout] $tag $sec%.1fs spillMem=$sm " +
        s"spillDisk=$sd")
      ((sec, sm, sd,
        if (r.isNullAt(0)) "0" else r.getDecimal(0).toPlainString,
        if (r.isNullAt(1)) "0" else r.getDecimal(1).toPlainString,
        r.getLong(2)))
    }
    def emit(tag: String, sec: Double, sm: Long, sd: Long, fo: String,
        fq: String, n: Long, extra: String): Unit =
      println(f"""[a1layout-result] {"tag":"$tag","sec":$sec%.1f,""" +
        f""""spill_mem":$sm,"spill_disk":$sd,"fp_oi":"$fo",""" +
        f""""fp_q3":"$fq","rows":$n$extra}""")

    if (mode == "plain") {
      val (s, sm, sd, fo, fq, n) = run("plain", plain)
      emit("plain", s, sm, sd, fo, fq, n, "")
      spark.stop()
      return
    }
    // "plainN" (e.g. plain4): the plain-layout fingerprint computed in
    // N disjoint key slices, one aggregate per slice, shuffle footprint
    // ~1/N each — the single-pass plain aggregate's ~30 GB of map
    // outputs + spill exceeds this box's free disk at 1 B rows. Sound
    // because the a1 group key (user_id, event_type, bucket) is a
    // refinement of the slice key (user_id, event_type): every group
    // lives wholly in one slice, and the fingerprint is a SUM of row
    // hashes — additive across disjoint slices (the caller adds the
    // slice sums). NOT a timing mode: the timed single-pass number
    // comes from a dedicated run.
    if (mode.startsWith("plain") && mode.length > 5) {
      val nSlices = mode.drop(5).toInt
      for (k <- 0 until nSlices) {
        val slice = plain.where(
          pmod(xxhash64(col("user_id"), col("event_type")),
            lit(nSlices.toLong)) === k)
        val (s, sm, sd, fo, fq, n) = run(s"plain_$k", slice)
        emit(s"plain_$k", s, sm, sd, fo, fq, n, "")
        reclaimShuffles()
      }
      spark.stop()
      return
    }
    // bucketed first (shuffle-free, no disk growth), plain last so its
    // spill + map outputs get the most free disk
    val bucketed = spark.table("events_bucketed")
    val (bSec, bSm, bSd, fpB, fqB, nB) = run("bucketed", bucketed)
    // the bucketed aggregate must plan WITHOUT any exchange
    val bPlan = a1(bucketed).queryExecution.executedPlan.toString
    val noExchange = !bPlan.contains("Exchange")
    System.err.println(s"[a1layout] bucketed plan exchange-free: " +
      noExchange)
    if (mode == "bucketed") {
      emit("bucketed", bSec, bSm, bSd, fpB, fqB, nB,
        f""","write_sec":$bucketWriteSec%.1f,"no_exchange":$noExchange""")
      spark.stop()
      return
    }
    reclaimShuffles()
    val (plainSec, plainSm, plainSd, fpP, fqP, nP) = run("plain", plain)

    val json = f"""{"metric":"a1_layout_probe","factor":$factor,""" +
      f""""n_buckets":$nBuckets,"cpus":$cpus,""" +
      f""""gen_sec":$genSec%.1f,"bucket_write_sec":$bucketWriteSec%.1f,""" +
      f""""plain_sec":$plainSec%.1f,"plain_spill_mem":$plainSm,""" +
      f""""plain_spill_disk":$plainSd,""" +
      f""""bucketed_sec":$bSec%.1f,"bucketed_spill_mem":$bSm,""" +
      f""""bucketed_spill_disk":$bSd,"no_exchange":$noExchange,""" +
      f""""rows_plain":$nP,"rows_bucketed":$nB,""" +
      f""""fp_oi_match":${fpP == fpB && nP == nB},""" +
      f""""fp_avg_q3_match":${fqP == fqB}}"""
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json)
    spark.stop()
  }
}
