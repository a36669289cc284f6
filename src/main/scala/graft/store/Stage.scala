package graft.store

import java.nio.file.{Files, Path}
import java.util.{Comparator, UUID}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Durable pipeline-boundary pins.
  *
  * `localCheckpoint(true)` truncates lineage but stores the pinned
  * blocks UNREPLICATED on executor-local storage: on a real cluster,
  * losing one executor mid-pipeline fails the whole job with no
  * recompute path — a fault-tolerance cliff when the pinned relation is
  * corpus-scale (hours of work lost to one machine). [[pin]] is the
  * staged-parquet alternative (the same discipline as
  * [[Store.buildIvfIndex]]): write the boundary relation to the staging
  * filesystem, read it back. The pin then survives executor loss
  * whenever the staging dir is on durable storage — set
  * `graft.stage.dir` to an HDFS/S3 path on a cluster; the local[*]
  * default is a JVM-lifetime temp dir (deleted on exit), where
  * executors share the driver's machine and durability is moot anyway.
  * Bonus over a reliable `checkpoint()`: the read-back is a COLUMNAR
  * scan Catalyst can prune per consumer, where a checkpoint's RDD scan
  * deserializes every column for every consumer.
  *
  * Discipline (VERDICT r9): durable pins for corpus-scale boundaries —
  * the tf relations (x11/x15), chunk pairs (x16), the k-means
  * assignment (d9), the CC edge list and its initial labels (d7) —
  * while `localCheckpoint` remains the right tool for aggregate-small
  * pins (per-round CC labels, dashboard-sized ingest batches) where
  * re-running the job on executor loss costs less than replicating the
  * pin.
  */
object Stage {

  @volatile private var defaultBase: Option[Path] = None

  // test observability: executed plans of pins materialized while
  // recording is on — lets PlanSpec assert the one-corpus-scan shape of
  // the pinned operators (the pin runs eagerly, so its scans never
  // appear in the caller's final plan)
  private val recorded =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
  @volatile private var recording = false

  private[graft] def startRecording(): Unit = { recorded.clear(); recording = true }
  private[graft] def stopRecording(): Seq[(String, String)] = {
    recording = false
    val out = List.newBuilder[(String, String)]
    recorded.forEach(p => out += p)
    out.result()
  }

  /** Staging root: `graft.stage.dir` if set (cluster deployments point
    * it at durable shared storage), else one JVM-lifetime temp dir.
    */
  private def baseDir(spark: SparkSession): String =
    spark.conf.getOption("graft.stage.dir").getOrElse(synchronized {
      defaultBase.getOrElse {
        val d = Files.createTempDirectory("graft-stage-")
        sys.addShutdownHook {
          if (Files.isDirectory(d))
            Files.walk(d).sorted(Comparator.reverseOrder[Path]())
              .forEach(p => Files.deleteIfExists(p))
        }
        defaultBase = Some(d)
        d
      }.toString
    })

  /** Materialize `df` to staged parquet and read it back — an eager,
    * durable, per-consumer-prunable pipeline-boundary pin. The explicit
    * read schema keeps the original column nullability (a bare parquet
    * read-back would widen everything to nullable) and makes empty
    * relations round-trip without schema inference.
    */
  def pin(df: DataFrame, tag: String): DataFrame = {
    val spark = df.sparkSession
    val path = s"${baseDir(spark)}/$tag-${UUID.randomUUID()}"
    if (recording)
      recorded.add(tag -> df.queryExecution.executedPlan.toString)
    df.write.mode(SaveMode.ErrorIfExists).parquet(path)
    created.add(path)
    spark.read.schema(df.schema).parquet(path)
  }

  private val created =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()

  /** Delete every pin this JVM has created so far — the unit-of-work
    * boundary of the pin lifecycle. Pins are UUID-fresh per [[pin]]
    * call and are never reused across queries, so without this a
    * long-lived process (a multi-pass bench, a query server, a cluster
    * job with `graft.stage.dir` on shared storage — where the local
    * temp-dir shutdown hook does not apply) accumulates corpus-scale
    * parquet indefinitely. Call at job/pass boundaries ONLY: any
    * still-alive DataFrame that reads a cleared pin will fail on next
    * use. Tracked-path deletion (not a recursive base-dir wipe) so a
    * shared `graft.stage.dir` loses exactly this job's pins.
    */
  def clear(spark: SparkSession): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    var p = created.poll()
    while (p != null) {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(conf).delete(hp, true)
      p = created.poll()
    }
  }
}
