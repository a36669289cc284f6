package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.similarity.Ann

/** Streaming semantic-decontamination gate — the ingest-time front of
  * the batch [[Ann.semanticDecon]] pass: incoming embedded documents
  * within cosine `tau` of ANY benchmark vector are dropped BEFORE they
  * reach the corpus store, so benchmark leakage never lands on disk.
  *
  * Unlike the digest and LSH gates ([[StreamDedup]], [[StreamNearDup]]),
  * this gate is STATELESS: the benchmark is fixed dimension data, not
  * stream-accumulated state, so the whole gate is one stream-static
  * LEFT ANTI join against the broadcast bench side — no watermark, no
  * state store, no eviction policy. Each micro-batch pays one pass over
  * (batch rows × bench rows) cosine folds, the same per-row cost as the
  * batch operator, and a row's verdict never changes (the bench set is
  * immutable within a deployment; swapping benchmarks is a restart with
  * a new dimension, like a mutable-label reload).
  *
  * Cosines are the ordered IEEE fold ([[Ann.cosine]]), so a vector
  * dropped here is EXACTLY the vector `d10`'s batch pass would flag —
  * the spec pins streamed survivors == batch complement on the same
  * corpus.
  */
object StreamSemDecon {

  /** Contamination predicate for one (stream row, bench row) pair. */
  private def hit(tau: Double, tNorm: Column, bNorm: Column): Column =
    Ann.cosine(col("embedding"), col("b_emb"), tNorm, bNorm) >= tau

  /** The gated stream: input rows (`vec_id`, `embedding`, …) that match
    * NO benchmark vector at `tau`. `bench` is a static (vec_id,
    * embedding) frame — benchmark-sized, broadcast.
    */
  def gate(stream: DataFrame, bench: DataFrame, tau: Double): DataFrame = {
    val b = broadcast(bench
      .select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
      .withColumn("b_norm", Ann.norm2(col("b_emb"))))
    stream
      .withColumn("__t_norm", Ann.norm2(col("embedding")))
      .join(b, hit(tau, col("__t_norm"), col("b_norm")), "left_anti")
      .drop("__t_norm")
  }
}
