package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.api.HttpApi
import graft.streaming.Prompb

/** Executor-loss probe for the WRITE path (VERDICT r11 #7's streaming
  * window): remote-write posts stream into an [[HttpApi]] store on
  * `local-cluster[2,…]` while one executor is SIGKILLed mid-flush —
  * specifically when the group-commit flusher has a pin in flight
  * (`pendingBatches > 0` with posts still arriving). Every point the
  * facade ACKNOWLEDGED must then be readable: the probe drains, reads
  * the store back, and compares count + value checksum against what it
  * wrote.
  *
  * This window is strictly harsher than LossProbe's: the ingest
  * batches are driver-acknowledged state whose ONLY copy after the pin
  * is the pinned relation itself (the driver releases the post rows on
  * pin), so the pin must either survive the loss or the loss must
  * surface as a retryable failure — silent shrinkage is the one
  * unacceptable outcome.
  *
  * Usage: StreamLossProbe [nPosts] [pointsPerPost] [flushEveryPosts]
  */
object StreamLossProbe {

  private val AddOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio", "java.base/java.util",
    "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic", "java.base/sun.nio.ch",
    "java.base/sun.nio.cs", "java.base/sun.security.action",
    "java.base/sun.util.calendar")
    .map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")

  def main(args: Array[String]): Unit = {
    val nPosts = args.lift(0).map(_.toInt).getOrElse(60)
    val perPost = args.lift(1).map(_.toInt).getOrElse(200)
    val flushEvery = args.lift(2).map(_.toInt).getOrElse(4)
    // which executor dies: "first" | "last" by pid. Block placement is
    // scheduler-dependent, so a single fixed victim can be the executor
    // that happens to hold NO pinned batch blocks — run BOTH variants
    // and the union covers every placement.
    val victimSel = args.lift(3).getOrElse("first")

    val stageDir = Files.createTempDirectory("stream-loss-stage").toString
    val classes = "/root/repo/target/scala-2.13/classes"
    val spark = GraftSession.configure(SparkSession.builder()
      .master("local-cluster[2,4,2048]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.executor.extraClassPath", classes)
      .config("spark.executor.extraJavaOptions", AddOpens)
      .config("graft.stage.dir", stageDir)
      .config("spark.task.maxFailures", "4"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val appId = spark.sparkContext.applicationId
    val deadline = System.nanoTime() + 120L * 1000000000L
    while (LossProbe.executorPids(appId).size < 2 &&
      System.nanoTime() < deadline) Thread.sleep(200)
    require(LossProbe.executorPids(appId).size >= 2,
      "local-cluster did not start 2 executors")

    val api = new HttpApi(spark, flushEveryPosts = flushEvery)

    // deterministic scrape shape: post i = series (i % 8), 200 points at
    // unique timestamps — every acknowledged point must survive
    def post(i: Int): Seq[Prompb.PromSeries] = Seq(Prompb.PromSeries(
      Map("__name__" -> "probe_metric", "series" -> s"s${i % 8}"),
      (0 until perPost).map(j =>
        (1700000000000L + i.toLong * perPost * 1000 + j * 1000,
          (i * perPost + j).toDouble))))
    val expectTotal = nPosts.toLong * perPost
    val expectSum = (0L until expectTotal).map(_.toDouble).sum

    // the killer: arm after a third of the posts, fire while a flush pin
    // is actually in flight (queued snapshots pending)
    val killedAt = new java.util.concurrent.atomic.AtomicLong(-1)
    val killer = new Thread(() => {
      val limit = System.nanoTime() + 120L * 1000000000L
      while (api.queuedFlushCount == 0 && System.nanoTime() < limit)
        Thread.sleep(1)
      val pids = LossProbe.executorPids(appId).sorted
      val victim = if (victimSel == "last") pids.last else pids.head
      killedAt.set(victim)
      System.err.println(s"[stream-loss] killing executor pid $victim " +
        s"(queuedFlushes=${api.queuedFlushCount}, " +
        s"pendingBatches=${api.pendingBatches})")
      Runtime.getRuntime.exec(Array("kill", "-9", victim.toString)).waitFor()
    }, "flush-killer")

    var acked = 0L
    var writeFailures = 0
    for (i <- 0 until nPosts) {
      if (i == nPosts / 3) killer.start()
      // a write that THROWS is allowed (client retries); a write that
      // returns success must be durable — retry loop mirrors a PRW client
      var done = false
      var attempts = 0
      while (!done) {
        try { acked += api.write(post(i), "default"); done = true }
        catch {
          case e: Throwable =>
            writeFailures += 1; attempts += 1
            if (attempts > 5) throw e
            Thread.sleep(200)
        }
      }
    }
    killer.join(10000)
    require(killedAt.get > 0, "killer never fired (no in-flight flush seen)")

    // read back with retries (a read may hit the loss window once; the
    // probe asserts it eventually serves every acknowledged point)
    def readBack(): (Long, Double) = {
      val df = api.rawPoints.get
        .groupBy("metric_id", "ts_ms")
        .agg(max_by(col("value"), col("__seq")).as("value"))
      val r = df.agg(count(lit(1)), sum(col("value"))).head()
      (r.getLong(0), r.getDouble(1))
    }
    var result: Option[(Long, Double)] = None
    var readFailures = 0
    while (result.isEmpty) {
      try result = Some(readBack())
      catch {
        case e: Throwable =>
          readFailures += 1
          if (readFailures > 5) throw e
          Thread.sleep(500)
      }
    }
    val (gotN, gotSum) = result.get
    // the probe must have exercised the DURABLE hot-pin path (BlockWhere
    // demonstrated the localCheckpoint medium loses the batch with its
    // executor): stage.dir is set, so the drained batches above must be
    // staged parquet. Checked AFTER the drain — before it, the first pin
    // may legitimately still be in flight.
    require(new java.io.File(stageDir).list()
      .exists(_.startsWith("hot-")),
      s"no staged hot-batch pins under $stageDir - durable path inactive")
    val pass = gotN == expectTotal && gotSum == expectSum &&
      acked == expectTotal
    println(s"""{"stream_loss_probe":"${if (pass) "pass" else "FAIL"}",""" +
      s""""victim":"$victimSel",""" +
      s""""acked":$acked,"expected":$expectTotal,"read":$gotN,""" +
      s""""sum_ok":${gotSum == expectSum},""" +
      s""""write_failures":$writeFailures,"read_failures":$readFailures,""" +
      s""""killed_pid":${killedAt.get}}""")
    api.stop()
    spark.stop()
    if (!pass) {
      System.err.println(
        s"expected $expectTotal points sum $expectSum, read $gotN sum $gotSum")
      sys.exit(1)
    }
  }
}
