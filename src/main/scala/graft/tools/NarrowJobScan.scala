package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import graft.{GraftSession, SparkEntry}

/** Suite-wide sweep for the r16 optimization signature: jobs that burn
  * significant wall time at near-zero parallelism (the single-row-group
  * scan-stage pattern). Runs every SparkEntry query once and prints any
  * job over `minMs` whose task count is at most `maxTasks` — the
  * candidates for a scan-parallelism floor the per-family profiling
  * might have missed. Local iteration aid, not part of the driver
  * contract.
  *
  * Usage: NarrowJobScan [sfDir] [minMs] [maxTasks]
  */
object NarrowJobScan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val minMs = args.lift(1).map(_.toLong).getOrElse(200L)
    val maxTasks = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class J(var start: Long = 0, var tasks: Int = 0)
    val jobs = mutable.Map.empty[Int, J]
    @volatile var flagged = List.empty[(Int, Long, Int)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs(e.jobId) = J(e.time, e.stageInfos.map(_.numTasks).sum)
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.remove(e.jobId).foreach { j =>
          val ms = e.time - j.start
          if (ms >= minMs && j.tasks <= maxTasks)
            flagged ::= ((e.jobId, ms, j.tasks))
        }
    })

    for (name <- SparkEntry.queries.keys.toSeq.sorted) {
      val scope = graft.store.Stage.open()
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch {
        case e: Throwable => // a crashed query must not read as "no narrow jobs"
          println(s"$name CRASHED ${e.getClass.getName}: " +
            String.valueOf(e.getMessage).take(160))
      }
      val sec = (System.nanoTime() - t0) / 1e9
      graft.store.Stage.clear(spark, scope)
      Thread.sleep(100) // listener bus drain
      if (flagged.nonEmpty) {
        val tot = flagged.map(_._2).sum
        println(f"$name%-28s $sec%5.2fs narrow ${flagged.size}%2d jobs " +
          f"$tot%5d ms  " + flagged.reverse.map { case (id, ms, t) =>
            s"j$id:${ms}ms/${t}t" }.mkString(" "))
      }
      // reset AFTER the drain + read, so a late job-end event from this
      // query cannot leak into the next query's flagged list
      flagged = Nil
    }
    spark.stop()
  }
}
