package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact dedup — the streaming front of the batch digest dedup
  * (`Dedup.exact` / `d1`): an ingest-time gate that drops re-crawled or
  * re-sent documents by content digest BEFORE they reach the corpus
  * store, so the batch dedup passes downstream see each content once per
  * retention window instead of once per crawl.
  *
  * Built on `flatMapGroupsWithState` with event-time timeout: digest
  * state lives in the streaming state store, sharded by digest across
  * executors (the same scale shape as [[HotBuffer]] — state per key, no
  * global structure), and is EVICTED once the event-time watermark
  * passes the winner's event time plus the delay. Semantics, pinned by
  * the spec AND deterministic under repartitioning (the reason this is
  * not `dropDuplicatesWithinWatermark`, which keeps an ARBITRARY
  * partition-order-dependent row among duplicates arriving in the same
  * micro-batch):
  *
  *  - within the watermark window, the earliest-event-time row wins,
  *    ties broken by smallest doc id — the deterministic streaming
  *    analogue of `Dedup.exact`'s smallest-doc-id rule. Across
  *    micro-batches the first-arriving batch wins (its winner is
  *    already in state); within a batch the group sees ALL of the
  *    batch's rows for the digest, so the min is exact regardless of
  *    partitioning;
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

  /** A digest-stamped document riding the stateful operator. */
  final case class Seen(docId: Long, text: String, tsMs: Long,
      digest: String)

  /** Wire shape INTO the stateful operator: keeps the watermarked
    * `__ts` attribute alive through `.as[]` (an untyped `map` would drop
    * the event-time metadata and EventTimeTimeout would reject the
    * query).
    */
  private[streaming] final case class Wire(docId: Long, text: String,
      tsMs: Long, digest: String, __ts: java.sql.Timestamp)

  /** Per-digest state machine: state = the winner's event time.
    *
    * Groups with new data are invoked with `hasTimedOut = false` even
    * when their timeout stamp has already passed, so the live branch
    * re-checks the stamp against the current watermark — otherwise a
    * re-crawl arriving in the same trigger that would have fired the
    * timeout gets wrongly dropped.
    */
  private def dedupGroup(delayMs: Long)(digest: String,
      rows: Iterator[Wire], state: GroupState[Long]): Iterator[Seen] = {
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      // Strict < to match EventTimeTimeout exactly: the engine fires the
      // timeout only when the watermark EXCEEDS the stamp, so at exact
      // equality a digest with no data has not yet timed out — a re-crawl
      // arriving with data must be treated the same (still a duplicate).
      if (state.exists &&
          state.get + delayMs < state.getCurrentWatermarkMs())
        state.remove()
      if (state.exists) Iterator.empty
      else {
        val batch = rows.toArray
        if (batch.isEmpty) Iterator.empty
        else {
          val w = batch.minBy(r => (r.tsMs, r.docId))
          state.update(w.tsMs)
          state.setTimeoutTimestamp(w.tsMs + delayMs)
          Iterator.single(Seen(w.docId, w.text, w.tsMs, w.digest))
        }
      }
    }
  }

  /** Digest-dedup `docs` within `delayMs` of event time. Output columns:
    * (docId, text, tsMs, digest) — survivors only, append mode.
    */
  def apply(docs: Dataset[Doc], delayMs: Long): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      // NO pre-hash repartition here, unlike StreamNearDup: one md5 per
      // doc is cheap enough that an extra full-text shuffle costs more
      // than the parallelism buys (measured r14 — the digest gate's
      // only worthwhile shuffle is the state exchange itself)
      .withColumn("digest", md5(col("text")))
      .withColumn("__ts", timestamp_millis(col("tsMs")))
      .withWatermark("__ts", s"$delayMs milliseconds")
      .as[Wire]
      .groupByKey(_.digest)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(dedupGroup(delayMs))
      .toDF()
  }
}
