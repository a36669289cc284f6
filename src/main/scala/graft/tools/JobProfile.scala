package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.{GraftSession, SparkEntry}

/** Per-job wall-time profile of one SparkEntry query: runs the query
  * twice (warmup + timed) and prints each Spark job's duration, stage
  * count, and task count, so multi-job pipelines (e2e_stream_slice,
  * d7/d9 loops) can be attributed stage-by-stage. Local iteration aid —
  * not part of the driver contract.
  *
  * Usage: JobProfile <query> [sfDir]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("e2e_stream_slice")
    val sfDir =
      if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class Job(desc: String, var ms: Long = -1,
        var stages: Int = 0, var tasks: Int = 0)
    val jobs = mutable.LinkedHashMap.empty[Int, Job]
    val starts = mutable.Map.empty[Int, Long]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        starts(e.jobId) = e.time
        val tail = e.stageInfos.lastOption.map(_.name).getOrElse("")
        jobs(e.jobId) = Job(
          s"${e.stageInfos.size} stages; last: ${tail.take(100)}")
        jobs(e.jobId).stages = e.stageInfos.size
        jobs(e.jobId).tasks = e.stageInfos.map(_.numTasks).sum
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.get(e.jobId).foreach(j => j.ms = e.time - starts(e.jobId))
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = ()
    }

    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).count() // warmup: codegen + shuffle files
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val n = fn(spark, sfDir).count()
    val sec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // let the listener bus drain
    println(f"== $name: $n rows in $sec%.2f s, ${jobs.size} jobs ==")
    jobs.foreach { case (id, j) =>
      println(f"job $id%3d ${j.ms}%6d ms  stages=${j.stages}%2d tasks=${j.tasks}%4d  ${j.desc}")
    }
    spark.stop()
  }
}
