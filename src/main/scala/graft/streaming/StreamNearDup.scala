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
  * Architecture (r14 — the state tax halved twice over):
  *  1. The band explode and all hashing stay codegen'd COLUMN
  *     expressions (k-independent per-row digest cost, same as d2).
  *  2. The doc payload (text) NEVER enters the state path: a stateless
  *     pass-through branch carries one (docId, text, tsMs) row per doc
  *     straight to the sink, unioned with the verdict stream — the r13
  *     gate still shipped every text through the band-0 state shuffle.
  *  3. Each micro-batch is MAP-SIDE COMBINED before the state
  *     exchange: a partition-local reduction collapses its band rows
  *     into one partial per (band, bucket) — the batch-local min plus
  *     the member list. The claim decision is an idempotent
  *     lexicographic-min, so partial mins recombine EXACTLY to the
  *     batch min inside the state operator (associativity — the same
  *     property the hot store's LWW folds lean on), and the typed
  *     `flatMapGroupsWithState` boundary prices per distinct bucket
  *     per partition instead of per (doc, band) row. The per-member
  *     verdict flatten happens AFTER the operator as a codegen'd
  *     `explode` — typed-land holds only the claim arithmetic.
  *
  * The state machine is unchanged from r13: `flatMapGroupsWithState`
  * keyed by (band, bucket), state sharded across executors, EVICTED
  * once the event-time watermark passes the claimant's event time plus
  * the delay (bounded state; the batch passes own cross-window dedup).
  * Within a micro-batch the group sees ALL of the batch's partials for
  * its bucket, so the claimant is exact under any partitioning, and
  * ties break by smallest docId — deterministic under adversarial
  * arrival order, same contract as [[StreamDedup]].
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

  /** One (doc, band) observation before the map-side combine. */
  private[streaming] final case class BandObs(docId: Long, tsMs: Long,
      band: Int, bucket: String)

  /** One doc's (id, event time) inside a bucket partial. */
  private[streaming] final case class Member(docId: Long, tsMs: Long)

  /** Partition-local partial per (band, bucket): the lexicographic
    * (tsMs, docId) min over this partition's members, the members
    * themselves, and `__ts` = the max member event time (carried so
    * the post-combine `withWatermark` sees the SAME per-batch max the
    * pre-combine column would have shown — the watermark advances
    * identically to the unreduced protocol).
    */
  private[streaming] final case class BucketPartial(band: Int,
      bucket: String, minTs: Long, minId: Long, members: Array[Member],
      __ts: java.sql.Timestamp)

  /** Claim state per (band, bucket): the claimant's identity. */
  private[streaming] final case class Claim(tsMs: Long, docId: Long)

  /** One bucket's per-trigger claim result: the (state-confirmed)
    * claimant plus every member observed this trigger — flattened to
    * per-(doc, band) verdicts in column land after the operator.
    */
  private[streaming] final case class BucketClaims(band: Int,
      claimTs: Long, claimId: Long, members: Array[Member])

  private def claimGroup(delayMs: Long)(key: (Int, String),
      rows: Iterator[BucketPartial], state: GroupState[Claim])
      : Iterator[BucketClaims] = {
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      // strict < to match EventTimeTimeout exactly (see StreamDedup)
      if (state.exists &&
          state.get.tsMs + delayMs < state.getCurrentWatermarkMs())
        state.remove()
      val ps = rows.toArray
      if (ps.isEmpty) Iterator.empty
      else {
        val claimant =
          if (state.exists) state.get
          else {
            // lexicographic min over partial mins == the batch min
            // (the combine commutes — see the class doc)
            val w = ps.minBy(p => (p.minTs, p.minId))
            Claim(w.minTs, w.minId)
          }
        state.update(claimant)
        // fixed window from the CLAIMANT's event time (later duplicates
        // do not extend it), mirroring StreamDedup's winner-stamp rule
        state.setTimeoutTimestamp(claimant.tsMs + delayMs)
        Iterator.single(BucketClaims(key._1, claimant.tsMs,
          claimant.docId, ps.flatMap(_.members)))
      }
    }
  }

  /** The verdict stream: per-(doc, band) rows `(docId, text, tsMs,
    * band, selfClaimed)` — text is null on band rows — PLUS one
    * payload row per doc with `band = -1`, `selfClaimed = true` and
    * the text (the stateless branch; [[survivorsBatch]] rejoins them).
    * `sigK` MinHash permutations in `rowsPerBand`-row bands over
    * `shingleLen`-token shingles — defaults match the batch chain's
    * d2/d3 settings.
    */
  def verdicts(docs: Dataset[Doc], delayMs: Long, sigK: Int = 16,
      shingleLen: Int = 3, rowsPerBand: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // spread the micro-batch across the session's parallelism BEFORE
    // the signature hash: a low-partition source (MemoryStream arrives
    // as ~one partition; a single Kafka partition likewise) otherwise
    // runs the ENTIRE k-permutation MinHash single-threaded — measured
    // as most of the r13 gate's "state tax" (the first shuffle in that
    // plan was the state exchange, so everything upstream of it
    // inherited the source's parallelism)
    val base = docs.toDF()
      .repartition(spark.sessionState.conf.numShufflePartitions)
    val bands = base
      .withColumn("xs", Dedup.xsCol(col("text"), shingleLen))
      .select(col("docId") +: col("tsMs") +: col("xs") +:
        Dedup.sigNamedCols(sigK): _*)
      // a doc with NO shingles (shorter than the window) cannot be
      // minhashed: without the guard every such doc lands in the one
      // all-null md5("") bucket and the gate would collapse them all to
      // a single survivor. Instead each rides a per-doc solo key — it
      // trivially self-claims and always passes (StreamDedup owns exact
      // duplicates; near-dupness is undefined below the shingle window)
      .select(col("docId"), col("tsMs"),
        posexplode(when(size(col("xs")) > 0,
          array(Dedup.bandDigestCols(sigK, rowsPerBand): _*))
          .otherwise(array(concat(lit("solo:"),
            col("docId").cast("string"))))))
      .toDF("docId", "tsMs", "band", "bucket")
    // map-side combine: one partial per (band, bucket) per partition —
    // the only rows the typed state boundary ever encodes
    val partials = bands.as[BandObs].mapPartitions { it =>
      final class Acc {
        var minTs = Long.MaxValue; var minId = Long.MaxValue
        var maxTs = Long.MinValue
        val members = scala.collection.mutable.ArrayBuffer.empty[Member]
      }
      val acc = scala.collection.mutable.LinkedHashMap
        .empty[(Int, String), Acc]
      it.foreach { r =>
        val a = acc.getOrElseUpdate((r.band, r.bucket), new Acc)
        if (r.tsMs < a.minTs ||
            (r.tsMs == a.minTs && r.docId < a.minId)) {
          a.minTs = r.tsMs; a.minId = r.docId
        }
        if (r.tsMs > a.maxTs) a.maxTs = r.tsMs
        a.members += Member(r.docId, r.tsMs)
      }
      acc.iterator.map { case ((band, bucket), a) =>
        BucketPartial(band, bucket, a.minTs, a.minId, a.members.toArray,
          new java.sql.Timestamp(a.maxTs))
      }
    }
    val claims = partials
      .withWatermark("__ts", s"$delayMs milliseconds")
      .groupByKey(p => (p.band, p.bucket))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(claimGroup(delayMs))
      .toDF()
    // per-member verdict flatten — codegen'd, outside typed land
    val bandVerdicts = claims
      .select(col("band"), col("claimTs"), col("claimId"),
        explode(col("members")).as("m"))
      .select(col("m.docId").as("docId"),
        lit(null).cast("string").as("text"),
        col("m.tsMs").as("tsMs"), col("band"),
        (col("m.docId") === col("claimId") &&
          col("m.tsMs") === col("claimTs")).as("selfClaimed"))
    // the stateless payload branch: text bypasses the state exchange
    val payload = base.select(col("docId"), col("text"), col("tsMs"),
      lit(-1).as("band"), lit(true).as("selfClaimed"))
    bandVerdicts.unionByName(payload)
  }

  /** Attribution-only variant (StreamGateBench `SGB_LSH_MODE=
    * verdicts0`): the identical pipeline MINUS the state operator —
    * partials flatten straight to always-true verdicts. The docs/s gap
    * between this and [[verdicts]] is the state exchange priced alone.
    * Not a gate: every doc "survives".
    */
  def verdictsStateless(docs: Dataset[Doc], sigK: Int = 16,
      shingleLen: Int = 3, rowsPerBand: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.toDF()
      .repartition(spark.sessionState.conf.numShufflePartitions)
    val bands = base
      .withColumn("xs", Dedup.xsCol(col("text"), shingleLen))
      .select(col("docId") +: col("tsMs") +: col("xs") +:
        Dedup.sigNamedCols(sigK): _*)
      .select(col("docId"), col("tsMs"),
        posexplode(when(size(col("xs")) > 0,
          array(Dedup.bandDigestCols(sigK, rowsPerBand): _*))
          .otherwise(array(concat(lit("solo:"),
            col("docId").cast("string"))))))
      .toDF("docId", "tsMs", "band", "bucket")
    val partials = bands.as[BandObs].mapPartitions { it =>
      final class Acc {
        var minTs = Long.MaxValue; var minId = Long.MaxValue
        var maxTs = Long.MinValue
        val members = scala.collection.mutable.ArrayBuffer.empty[Member]
      }
      val acc = scala.collection.mutable.LinkedHashMap
        .empty[(Int, String), Acc]
      it.foreach { r =>
        val a = acc.getOrElseUpdate((r.band, r.bucket), new Acc)
        if (r.tsMs < a.minTs ||
            (r.tsMs == a.minTs && r.docId < a.minId)) {
          a.minTs = r.tsMs; a.minId = r.docId
        }
        if (r.tsMs > a.maxTs) a.maxTs = r.tsMs
        a.members += Member(r.docId, r.tsMs)
      }
      acc.iterator.map { case ((band, bucket), a) =>
        BucketPartial(band, bucket, a.minTs, a.minId, a.members.toArray,
          new java.sql.Timestamp(a.maxTs))
      }
    }
    val bandVerdicts = partials.toDF()
      .select(col("band"), col("minTs").as("claimTs"),
        col("minId").as("claimId"), explode(col("members")).as("m"))
      .select(col("m.docId").as("docId"),
        lit(null).cast("string").as("text"),
        col("m.tsMs").as("tsMs"), col("band"),
        (col("m.docId") === col("claimId") &&
          col("m.tsMs") === col("claimTs")).as("selfClaimed"))
    val payload = base.select(col("docId"), col("text"), col("tsMs"),
      lit(-1).as("band"), lit(true).as("selfClaimed"))
    bandVerdicts.unionByName(payload)
  }

  /** The batch-local per-doc reduction: survivors of ONE trigger's
    * verdicts (docId, text, tsMs) — a doc survives iff every band
    * verdict it received is self-claimed. Run inside `foreachBatch`.
    */
  def survivorsBatch(verdicts: DataFrame): DataFrame =
    verdicts.groupBy("docId")
      .agg(min(when(col("selfClaimed"), 1).otherwise(0)).as("__all"),
        // the text rides the band = -1 payload row only (see
        // [[verdicts]]) — pick the non-null one regardless of order
        first(col("text"), ignoreNulls = true).as("text"),
        first(col("tsMs")).as("tsMs"))
      .where(col("__all") === 1)
      .select("docId", "text", "tsMs")
}
