package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming exact dedup — the streaming front of the batch digest dedup
  * (`Dedup.exact` / `d1`): an ingest-time gate that drops re-crawled or
  * re-sent documents by content digest BEFORE they reach the corpus
  * store, so the batch dedup passes downstream see each content once per
  * retention window instead of once per crawl.
  *
  * Built on `dropDuplicatesWithinWatermark`: digest state lives in the
  * streaming state store, sharded by digest across executors (the same
  * scale shape as [[HotBuffer]] — state per key, no global structure),
  * and is EVICTED once the event-time watermark passes the first-seen
  * time plus the delay. Semantics, pinned by the spec:
  *
  *  - within the watermark window, first-seen wins (exactly the batch
  *    rule — `Dedup.exact` keeps the smallest doc id, and arrival order
  *    under event-time watermarking is the streaming analogue);
  *  - after eviction the same digest passes again — a RE-crawl beyond
  *    the window is a new observation by design (retention-bounded
  *    state is what makes the operator runnable forever; unbounded
  *    digest state would OOM the state store at 100 TB — the batch d1
  *    pass owns cross-window dedup);
  *  - late rows older than the watermark may be dropped by the engine
  *    itself, the standard watermark contract.
  */
object StreamDedup {

  /** One incoming document on the ingest stream. */
  final case class Doc(docId: Long, text: String, tsMs: Long)

  /** Digest-dedup `docs` within `delayMs` of event time. Output columns:
    * (docId, text, tsMs, digest) — survivors only, append mode.
    */
  def apply(docs: Dataset[Doc], delayMs: Long): DataFrame =
    docs
      .withColumn("__ts", timestamp_millis(col("tsMs")))
      .withColumn("digest", md5(col("text")))
      .withWatermark("__ts", s"$delayMs milliseconds")
      .dropDuplicatesWithinWatermark("digest")
      .select("docId", "text", "tsMs", "digest")
}
