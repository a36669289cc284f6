package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.dedup.Dedup

/** Streaming MinHash-LSH near-dup gate — the streaming front of the
  * batch LSH chain (`d2`/`d3`/`d7`): an ingest-time filter that drops
  * near-duplicate documents (boilerplate re-posts, templated spam,
  * lightly-edited re-crawls) BEFORE they reach the corpus store, using
  * the SAME signature/band construction as the batch chain
  * (`Dedup.xsCol` → `sigExprs` → `bandDigestCols`), so a document's
  * band buckets here are bit-identical to `d3`'s.
  *
  * Discipline (the streaming analogue of `d7`'s cluster-min rule): each
  * (band, bucket) key is CLAIMED by the (tsMs, docId)-minimal document
  * observed for it within the watermark window; a document survives iff
  * it claims EVERY one of its bands. Near-dup chains (A~B on one band,
  * B~C on another) therefore collapse to the earliest member — the same
  * "keep the cluster minimum" outcome the batch `dupClusters` pass
  * produces, reached online. Claims are by OBSERVATION, not survival: a
  * dropped doc's claims stand (a later doc matching only the dropped
  * one is still a member of the same near-dup cluster — conservative,
  * like the hub-star in `lshCandidates`). Banding is probabilistic the
  * usual way: only docs sharing a full band collide, so recall follows
  * the (k, rowsPerBand) S-curve; the batch chain owns exact Jaccard
  * verification downstream.
  *
  * Architecture: the band explode and all hashing are codegen'd COLUMN
  * expressions (k-independent per-row digest cost, same as d2); only
  * the claim state machine is typed — `flatMapGroupsWithState` keyed by
  * (band, bucket), state sharded across executors, EVICTED once the
  * event-time watermark passes the claimant's event time plus the
  * delay (bounded state; the batch passes own cross-window dedup).
  * Within a micro-batch the group sees ALL of the batch's rows for its
  * bucket, so the claimant is exact under any partitioning, and ties
  * break by smallest docId — deterministic under adversarial arrival
  * order, same contract as [[StreamDedup]].
  *
  * Spark disallows stateful operators downstream of
  * `flatMapGroupsWithState`, so the per-doc "claimed all bands" verdict
  * reduction is BATCH-LOCAL by construction (every band verdict of a
  * doc is emitted in the doc's own trigger): [[survivorsBatch]] runs it
  * inside the sink's `foreachBatch` — the standard shape for a gate
  * that writes survivors to the corpus store per trigger.
  */
object StreamNearDup {

  /** One incoming document on the ingest stream. */
  final case class Doc(docId: Long, text: String, tsMs: Long)

  /** One (doc, band) observation riding the stateful operator. */
  private[streaming] final case class BandWire(docId: Long, text: String,
      tsMs: Long, band: Int, bucket: String, __ts: java.sql.Timestamp)

  /** Claim state per (band, bucket): the claimant's identity. */
  private[streaming] final case class Claim(tsMs: Long, docId: Long)

  /** Per-(doc, band) verdict: did this doc claim this band? */
  final case class BandVerdict(docId: Long, text: String, tsMs: Long,
      band: Int, selfClaimed: Boolean)

  private def claimGroup(delayMs: Long)(key: (Int, String),
      rows: Iterator[BandWire], state: GroupState[Claim])
      : Iterator[BandVerdict] = {
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      // strict < to match EventTimeTimeout exactly (see StreamDedup)
      if (state.exists &&
          state.get.tsMs + delayMs < state.getCurrentWatermarkMs())
        state.remove()
      val batch = rows.toArray
      if (batch.isEmpty) Iterator.empty
      else {
        val claimant =
          if (state.exists) state.get
          else {
            val w = batch.minBy(r => (r.tsMs, r.docId))
            Claim(w.tsMs, w.docId)
          }
        state.update(claimant)
        // fixed window from the CLAIMANT's event time (later duplicates
        // do not extend it), mirroring StreamDedup's winner-stamp rule
        state.setTimeoutTimestamp(claimant.tsMs + delayMs)
        batch.iterator.map(r => BandVerdict(r.docId, r.text, r.tsMs,
          r.band, r.docId == claimant.docId && r.tsMs == claimant.tsMs))
      }
    }
  }

  /** The per-(doc, band) verdict stream. `sigK` MinHash permutations in
    * `rowsPerBand`-row bands over `shingleLen`-token shingles — defaults
    * match the batch chain's d2/d3 settings.
    */
  def verdicts(docs: Dataset[Doc], delayMs: Long, sigK: Int = 16,
      shingleLen: Int = 3, rowsPerBand: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.toDF()
      .withColumn("__ts", timestamp_millis(col("tsMs")))
      .withWatermark("__ts", s"$delayMs milliseconds")
      .withColumn("xs", Dedup.xsCol(col("text"), shingleLen))
      .select(col("docId") +: col("text") +: col("tsMs") +: col("__ts") +:
        col("xs") +: Dedup.sigNamedCols(sigK): _*)
      // a doc with NO shingles (shorter than the window) cannot be
      // minhashed: without the guard every such doc lands in the one
      // all-null md5("") bucket and the gate would collapse them all to
      // a single survivor. Instead each rides a per-doc solo key — it
      // trivially self-claims and always passes (StreamDedup owns exact
      // duplicates; near-dupness is undefined below the shingle window)
      .select(col("docId"), col("text"), col("tsMs"), col("__ts"),
        posexplode(when(size(col("xs")) > 0,
          array(Dedup.bandDigestCols(sigK, rowsPerBand): _*))
          .otherwise(array(concat(lit("solo:"),
            col("docId").cast("string"))))))
      .toDF("docId", "text", "tsMs", "__ts", "band", "bucket")
      // the claim logic never reads the text — it is pass-through
      // baggage for the survivor output. Shipping it on EVERY band row
      // multiplied the state shuffle's byte volume by the band count
      // (the r12 gate's 1.8k docs/s floor was mostly this); band 0
      // alone carries it, and the batch-local reduction picks it back
      // up per doc ([[survivorsBatch]]'s ignoreNulls first)
      .withColumn("text", when(col("band") === 0, col("text")))
      .as[BandWire]
      .groupByKey(w => (w.band, w.bucket))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(claimGroup(delayMs))
      .toDF()
  }

  /** The batch-local per-doc reduction: survivors of ONE trigger's
    * verdicts (docId, text, tsMs) — a doc survives iff every band
    * verdict it received is self-claimed. Run inside `foreachBatch`.
    */
  def survivorsBatch(verdicts: DataFrame): DataFrame =
    verdicts.groupBy("docId")
      .agg(min(when(col("selfClaimed"), 1).otherwise(0)).as("__all"),
        // the text rides band 0 only (see [[verdicts]]) — pick the
        // non-null one regardless of verdict arrival order
        first(col("text"), ignoreNulls = true).as("text"),
        first(col("tsMs")).as("tsMs"))
      .where(col("__all") === 1)
      .select("docId", "text", "tsMs")
}
