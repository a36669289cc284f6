package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-based sessionization — the streaming front of the batch
  * `q2_sessionize` window chain (reference workload shape:
  * tests/squirreldb-day-query reads whole user days back; the analytics
  * side builds the sessions as events ARRIVE instead of re-windowing the
  * corpus per query).
  *
  * Built on `flatMapGroupsWithState` with event-time timeout, state
  * sharded by user — the same scale shape as [[StreamDedup]]. Per-user
  * state is a SET OF DISJOINT OPEN INTERVALS (start, end, count), not a
  * single open session: rows may arrive in any order the watermark
  * admits, and a late bridge row must be able to MERGE two provisional
  * sessions the way the batch sort would have — single-open-session
  * streaming sessionizers silently split sessions under reordering.
  * Interval state is bounded: an interval is emitted (and dropped) as a
  * closed [[StreamSessionize.Session]] once the watermark strictly
  * exceeds `end + gap` — from then on every admissible row has
  * `ts ≥ watermark > end + gap` and can neither extend nor precede it,
  * which is also why the per-user `emitted` ordinal matches the batch
  * chain's time-ordered `session_id` exactly: sessions close in start
  * order, and no admissible late row can create an earlier session after
  * a later one has closed.
  *
  * Equivalence contract (spec-gated): for any arrival order whose rows
  * are admitted by the watermark, once the watermark passes the last
  * event + gap the emitted sessions are IDENTICAL — ids, counts,
  * boundaries — to batch `q2_sessionize` over the same rows.
  */
object StreamSessionize {

  /** One event on the ingest stream. */
  final case class Event(userId: Long, eventId: Long, tsMs: Long)

  /** Wire shape into the stateful operator (keeps the watermarked `__ts`
    * attribute alive through `.as[]` — see [[StreamDedup.Wire]]).
    */
  private[streaming] final case class Wire(userId: Long, eventId: Long,
      tsMs: Long, __ts: java.sql.Timestamp)

  /** A closed session: `sessionId` is the per-user 1-based ordinal in
    * start-time order — the batch chain's running-sum session id.
    */
  final case class Session(userId: Long, sessionId: Long, nEvents: Long,
      tStartMs: Long, tEndMs: Long)

  /** One provisional (still extendable) session interval. */
  final case class Interval(startMs: Long, endMs: Long, n: Long)

  /** Per-user state: closed-session count + open intervals (kept sorted
    * by start; disjoint with gaps > gapMs between them by construction).
    */
  final case class UserState(emitted: Long, open: List[Interval])

  /** Merge a sorted-by-start interval list: adjacent intervals whose gap
    * is ≤ gapMs collapse (event counts add) — exactly the batch rule
    * `ts - prev > gap ⇒ new session` applied to interval endpoints.
    */
  private[graft] def mergeSorted(xs: List[Interval],
      gapMs: Long): List[Interval] =
    xs.foldLeft(List.empty[Interval]) {
      case (acc @ (h :: t), i) if i.startMs - h.endMs <= gapMs =>
        Interval(h.startMs, math.max(h.endMs, i.endMs), h.n + i.n) :: t
      case (acc, i) => i :: acc
    }.reverse

  private def sessionGroup(gapMs: Long)(userId: Long,
      rows: Iterator[Wire], state: GroupState[UserState]): Iterator[Session] = {
    val prev = state.getOption.getOrElse(UserState(0L, Nil))
    // fold the batch's rows (as 1-event intervals) into the open set —
    // batch-local exactness: the group sees ALL of the batch's rows for
    // this user, so the merged result is independent of partitioning
    val rowIvs = rows.map(r => Interval(r.tsMs, r.tsMs, 1L)).toList
    val merged = mergeSorted(
      (prev.open ++ rowIvs).sortBy(i => (i.startMs, i.endMs)), gapMs)
    // close every interval the watermark has passed (strict >, matching
    // EventTimeTimeout's firing rule); they close in start order because
    // disjoint intervals separated by > gap have ordered end+gap stamps
    val wm = state.getCurrentWatermarkMs()
    val (closed, stillOpen) = merged.partition(_.endMs + gapMs < wm)
    val out = closed.zipWithIndex.map { case (iv, k) =>
      Session(userId, prev.emitted + k + 1, iv.n, iv.startMs, iv.endMs)
    }
    if (stillOpen.isEmpty) state.remove()
    else {
      state.update(UserState(prev.emitted + closed.size, stillOpen))
      // earliest possible close; clamp above the watermark (an interval
      // with end+gap == wm is not yet closeable but the engine requires
      // a strictly-future timeout stamp)
      state.setTimeoutTimestamp(
        math.max(stillOpen.map(_.endMs).min + gapMs, wm + 1))
    }
    out.iterator
  }

  /** Sessionize `events` (user_id, event_id, ts_ms) with the given
    * inactivity gap; `delayMs` is the watermark lateness bound. Output:
    * closed sessions only (append mode) —
    * (userId, sessionId, nEvents, tStartMs, tEndMs).
    */
  def apply(events: Dataset[Event], gapMs: Long, delayMs: Long): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("__ts", timestamp_millis(col("tsMs")))
      .withWatermark("__ts", s"$delayMs milliseconds")
      .as[Wire]
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(sessionGroup(gapMs))
      .toDF()
  }
}
