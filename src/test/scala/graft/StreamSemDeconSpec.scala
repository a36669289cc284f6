package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.similarity.Ann
import graft.streaming.StreamSemDecon

class StreamSemDeconSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** (vec_id, embedding) rows of the fixture corpus. */
  private def emb = Tables.embeddings(spark, sfDir)
    .select("vec_id", "embedding")

  private def bench = emb.where(col("vec_id") % 17 === 3)

  private def train = emb.where(col("vec_id") % 17 =!= 3)

  test("streamed survivors == batch complement of semanticDecon, " +
    "across micro-batch boundaries") {
    val spark0 = spark
    import spark0.implicits._
    val tau = 0.35 // cuts through the organic cosine tail (see d10)
    val rows = train.as[(Long, Array[Float])].collect().toSeq
    assert(rows.nonEmpty)
    val contaminated = Ann.semanticDecon(train, bench, tau)
      .select("vec_id").as[Long].collect().toSet
    assert(contaminated.nonEmpty, "fixture must have organic hits at τ")

    val benchStatic = bench
    implicit val sqlCtx = spark0.sqlContext
    val input = MemoryStream[(Long, Array[Float])]
    val out = ArrayBuffer.empty[Long]
    val q = StreamSemDecon.gate(
        input.toDS().toDF("vec_id", "embedding"), benchStatic, tau)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val ids = batch.select("vec_id").as[Long].collect()
        out.synchronized { out ++= ids }
        ()
      }.start()
    try {
      // three uneven micro-batches: the verdict must not depend on how
      // rows group into triggers (the gate is stateless by design)
      val (a, rest) = rows.splitAt(rows.size / 3)
      val (b, c) = rest.splitAt(rest.size / 2)
      for (part <- Seq(a, b, c)) {
        input.addData(part)
        q.processAllAvailable()
      }
    } finally q.stop()

    val survivors = out.toSet
    val expected = rows.map(_._1).toSet -- contaminated
    assert(survivors === expected)
  }

  test("the bench side broadcasts (stateless gate plans no shuffle of " +
    "the stream side)") {
    val plan = StreamSemDecon.gate(train, bench, 0.35)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") &&
      plan.contains("LeftAnti"), plan)
    assert(!plan.contains("SortMergeJoin"))
  }
}
