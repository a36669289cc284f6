package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.RDDBlockId

import graft.GraftSession

/** Diagnostic: where do `localCheckpoint` blocks actually live on
  * `local-cluster`? StreamLossProbe passes under BOTH victim choices
  * with zero read failures, which is only explicable if the pinned
  * ingest batches' blocks are reachable after either executor dies —
  * this prints the block-manager locations of a freshly checkpointed
  * single-partition LocalRelation so the SCALE.md claim rests on an
  * observed placement, not an inference.
  */
object BlockWhere {
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
    val spark = GraftSession.configure(SparkSession.builder()
      .master("local-cluster[2,4,2048]")
      .config("spark.executor.extraClassPath",
        "/root/repo/target/scala-2.13/classes")
      .config("spark.executor.extraJavaOptions", AddOpens))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    Thread.sleep(8000)
    val df = (1 to 1000).map(i => (i, s"v$i")).toDF("a", "b")
      .coalesce(1).localCheckpoint(true)
    df.count()
    val rddId = df.queryExecution.toRdd.id
    val env = org.apache.spark.SparkEnv.get
    var holder: Option[String] = None
    for (rid <- (rddId - 8) to (rddId + 2); p <- 0 until 4) {
      val st = env.blockManager.master.getLocations(RDDBlockId(rid, p))
      if (st.nonEmpty) {
        println(s"rdd_${rid}_$p -> ${st.mkString(", ")}")
        if (holder.isEmpty) holder = Some(st.head.executorId)
      }
    }
    // decisive: SIGKILL the executor HOLDING the checkpoint block, then
    // try to read the checkpointed dataset — does it throw, or recover?
    holder.foreach { ex =>
      val appId = spark.sparkContext.applicationId
      // map executor id -> pid via /proc cmdline (--executor-id <ex>)
      val victim = new java.io.File("/proc")
        .listFiles((_, n) => n.forall(_.isDigit)).toSeq.find { d =>
          try {
            val cmd = new String(java.nio.file.Files.readAllBytes(
              d.toPath.resolve("cmdline"))).replace('\u0000', ' ')
            cmd.contains("CoarseGrainedExecutorBackend") &&
              cmd.contains(appId) && cmd.contains(s"--executor-id $ex")
          } catch { case _: Throwable => false }
        }.map(_.getName.toLong)
      println(s"holder executor=$ex pid=$victim; killing it")
      victim.foreach(p => Runtime.getRuntime
        .exec(Array("kill", "-9", p.toString)).waitFor())
      Thread.sleep(1500)
      try println(s"post-kill count = ${df.count()} (RECOVERED)")
      catch { case e: Throwable =>
        println(s"post-kill read FAILED: ${e.getClass.getSimpleName}: " +
          s"${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString}")
      }
    }
    spark.stop()
  }
}
