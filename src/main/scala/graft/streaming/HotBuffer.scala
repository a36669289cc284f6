package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-series hot buffer as custom streaming state (SURVEY §2.8 T1/T4/T8,
  * §2.1 S10). The reference keeps ~15 min of points per metric in
  * Redis/memory with conflict-safe read-modify-write and ownership
  * machinery (`batch/batch.go:368-503,914-1033`); under Spark the same
  * contract is a `flatMapGroupsWithState` function:
  *
  *  - samples accumulate per series in managed state (checkpointed —
  *    ownership/takeover disappears);
  *  - once the series' newest timestamp passes `horizonMs` beyond a
  *    buffered sample, that sample is FLUSHED: emitted sorted by
  *    timestamp with last-write-wins dedup (the reference sorts+dedups
  *    on flush only when out-of-order was detected,
  *    `batch/batch.go:701-735` — here it is unconditional and cheap);
  *  - newer samples stay buffered, exactly like the reference re-appends
  *    the hot tail to the temp store after a flush.
  *
  * State size is bounded by samples-per-series within the horizon; at
  * scale the state store shards by series key across executors.
  */
object HotBuffer {

  final case class Sample(series: String, tsMs: Long, value: Double, seq: Long)
  final case class BufState(samples: List[Sample])

  /** Flush decision for one series and one micro-batch. */
  private[streaming] def step(horizonMs: Long)(
      key: String,
      incoming: Iterator[Sample],
      state: GroupState[BufState]): Iterator[Sample] = {
    val buf = state.getOption.map(_.samples).getOrElse(Nil) ++ incoming
    if (buf.isEmpty) return Iterator.empty
    val newest = buf.iterator.map(_.tsMs).max
    val cutoff = newest - horizonMs
    val (flush, keep) = buf.partition(_.tsMs < cutoff)
    state.update(BufState(keep))
    // sorted, last-write-wins per timestamp (highest seq survives)
    flush.groupBy(_.tsMs).iterator
      .map { case (_, dups) => dups.maxBy(_.seq) }
      .toSeq.sortBy(_.tsMs).iterator
  }

  /** Wire the buffer into a streaming Dataset of samples. */
  def apply(samples: Dataset[Sample], horizonMs: Long): Dataset[Sample] = {
    implicit val enc = Encoders.product[Sample]
    implicit val senc = Encoders.product[BufState]
    samples
      .groupByKey(_.series)(Encoders.STRING)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(step(horizonMs))
  }
}
