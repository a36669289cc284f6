package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.{GraftSession, SparkEntry}

/** Executor-loss recovery probe for the durable-pin discipline
  * ([[graft.store.Stage.pin]]).
  *
  * SCALE.md's executor-loss table argues from Spark semantics that a
  * staged-parquet pin survives losing an executor mid-pipeline (the pin
  * lives on shared storage, not in executor block managers, so the
  * downstream stages re-schedule and re-read instead of failing the
  * job). This harness DEMONSTRATES it:
  *
  *  1. run the probed query once on plain `local[*]` → reference rows;
  *  2. run it on `local-cluster[2, …]` — two REAL executor processes —
  *     with `graft.stage.dir` on shared (driver-local) disk; building
  *     the query materializes its corpus-scale pins;
  *  3. SIGKILL one executor process (found by its
  *     `CoarseGrainedExecutorBackend` cmdline);
  *  4. collect the query's result through the surviving/replacement
  *     executors and compare against the reference row-for-row.
  *
  * Exit 0 + `{"loss_probe":"pass",…}` on stdout iff the post-kill result
  * is identical. Default query `x11_tfidf_keywords` (durable tf pin);
  * pass another SparkEntry key (e.g. `d9_semdedup`) as args(1).
  *
  * Run with `SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13` — the
  * standalone Worker's executor launcher resolves its classpath through
  * the Spark distribution (without the version pin it probes build
  * directories that exist only in a source checkout).
  */
object LossProbe {

  private val AddOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio", "java.base/java.util",
    "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic", "java.base/sun.nio.ch",
    "java.base/sun.nio.cs", "java.base/sun.security.action",
    "java.base/sun.util.calendar")
    .map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")

  /** PIDs of live executor backends OF THIS APP (children of the
    * local-cluster workers), via /proc cmdline scan — no JDK tooling
    * dependency. Filtering on the Spark application id is load-bearing:
    * an unfiltered scan once SIGKILLed a CONCURRENT harness's executors
    * (two local-cluster probes on one machine), sabotaging that run and
    * making this one's "recovery" vacuous.
    */
  private[tools] def executorPids(appId: String): Seq[Long] = {
    val proc = new java.io.File("/proc")
    proc.listFiles((_, n) => n.forall(_.isDigit)).toSeq.flatMap { d =>
      try {
        val cmd = new String(Files.readAllBytes(d.toPath.resolve("cmdline")))
        if (cmd.contains("CoarseGrainedExecutorBackend") &&
          cmd.contains(appId)) Some(d.getName.toLong)
        else None
      } catch { case _: Throwable => None }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val qname = if (args.length > 1) args(1) else "x11_tfidf_keywords"
    val fn = SparkEntry.queries(qname)

    // ---- reference pass: plain local mode ----
    val s1 = GraftSession.configure(SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", 8))
      .getOrCreate()
    s1.sparkContext.setLogLevel("ERROR")
    val expected = fn(s1, sfDir).collect().map(_.toString).sorted.toSeq
    graft.store.Stage.clear(s1)
    s1.stop()

    // ---- cluster pass: two real executor processes ----
    val stageDir = Files.createTempDirectory("loss-probe-stage").toString
    val classes = "/root/repo/target/scala-2.13/classes"
    val s2 = GraftSession.configure(SparkSession.builder()
      .master("local-cluster[2,4,2048]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.executor.extraClassPath", classes)
      .config("spark.executor.extraJavaOptions", AddOpens)
      .config("graft.stage.dir", stageDir)
      // fail fast if recovery does NOT work: one task-retry budget
      .config("spark.task.maxFailures", "4"))
      .getOrCreate()
    s2.sparkContext.setLogLevel("ERROR")
    val appId = s2.sparkContext.applicationId
    val deadline = System.nanoTime() + 120L * 1000000000L
    while (executorPids(appId).size < 2 && System.nanoTime() < deadline)
      Thread.sleep(200)
    require(executorPids(appId).size >= 2,
      "local-cluster did not start 2 executors")

    // Kill window (args(2)): WHEN the executor dies relative to the pin
    // lifecycle — r11 only exercised "between" (pins durable, kill
    // before the consuming job). r12 adds the other two timing windows
    // the discipline must survive:
    //   during-pin     SIGKILL while a staged-parquet pin WRITE is
    //                  in flight (Stage.pin's inFlight window) — the
    //                  write job must finish via task retry on the
    //                  survivor/replacement executor;
    //   during-shuffle SIGKILL when the CONSUMING job submits its first
    //                  stage — lost shuffle map output must recompute
    //                  from the durable pin, not fail the job.
    val window = if (args.length > 2) args(2) else "between"
    val killed = new java.util.concurrent.atomic.AtomicLong(-1)
    def killOne(tag: String): Unit = {
      val victim = executorPids(appId).head
      killed.set(victim)
      System.err.println(s"[loss-probe] killing executor pid $victim ($tag)")
      Runtime.getRuntime.exec(Array("kill", "-9", victim.toString)).waitFor()
    }

    val pinKiller =
      if (window == "during-pin") {
        val t = new Thread(() => {
          val limit = System.nanoTime() + 120L * 1000000000L
          while (graft.store.Stage.inFlightCount == 0 &&
            System.nanoTime() < limit) Thread.sleep(2)
          if (graft.store.Stage.inFlightCount > 0)
            killOne("mid-pin-materialization")
        }, "pin-killer")
        t.setDaemon(true); t.start(); Some(t)
      } else None

    // building the query runs its pin writes (Stage.pin is eager)
    val df = fn(s2, sfDir)
    pinKiller.foreach(_.join(5000))
    val pinned = new java.io.File(stageDir).list()
    require(pinned != null && pinned.nonEmpty,
      s"$qname materialized no durable pin under $stageDir")

    window match {
      case "between" =>
        // kill AFTER the pins exist, BEFORE consuming them
        killOne(s"between (pins: ${pinned.mkString(", ")})")
        Thread.sleep(1000) // let the scheduler notice the loss
      case "during-pin" =>
        require(killed.get > 0,
          "during-pin window never armed: no pin write observed")
      case "during-shuffle" =>
        // arm on the consuming job's first stage submission
        s2.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            private val once = new java.util.concurrent.atomic.AtomicBoolean
            override def onStageSubmitted(
                e: org.apache.spark.scheduler.SparkListenerStageSubmitted)
                : Unit =
              if (!once.getAndSet(true)) killOne("consuming-stage-submitted")
          })
      case other => sys.error(s"unknown kill window: $other")
    }

    val got = df.collect().map(_.toString).sorted.toSeq
    require(killed.get > 0, s"window $window never fired a kill")
    val pass = got == expected
    println(s"""{"loss_probe":"${if (pass) "pass" else "FAIL"}",""" +
      s""""query":"$qname","window":"$window","rows":${got.size},""" +
      s""""pins":${pinned.length},"killed_pid":${killed.get}}""")
    s2.stop()
    if (!pass) {
      System.err.println(s"expected ${expected.size} rows, got ${got.size}")
      sys.exit(1)
    }
  }
}
