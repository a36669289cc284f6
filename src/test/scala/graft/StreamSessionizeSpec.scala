package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamSessionize
import graft.streaming.StreamSessionize.{Event, Interval, Session}

class StreamSessionizeSpec extends SparkSpec {

  /** Straight port of the batch q2 chain: per-user sort by (ts, id),
    * `ts - prev > gap` starts a session, 1-based running ordinal.
    */
  private def refSessions(events: Seq[Event],
      gapMs: Long): Seq[Session] =
    events.groupBy(_.userId).toSeq.flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e.tsMs, e.eventId))
      val sessions = sorted.foldLeft(List.empty[List[Event]]) {
        case (cur :: done, e) if e.tsMs - cur.head.tsMs <= gapMs =>
          (e :: cur) :: done // cur.head is the session's LATEST event
        case (acc, e) => List(e) :: acc
      }.reverse
      sessions.zipWithIndex.map { case (s, i) =>
        Session(u, i + 1L, s.size.toLong,
          s.map(_.tsMs).min, s.map(_.tsMs).max)
      }
    }

  private def runBatches(batches: Seq[Seq[Event]], gapMs: Long,
      delayMs: Long, sink: String): Seq[Session] = {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark0.sqlContext
    val input = MemoryStream[Event]
    val q = StreamSessionize(input.toDS(), gapMs, delayMs)
      .writeStream.outputMode("append").format("memory")
      .queryName(sink).start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      spark0.table(sink).as[Session].collect().toSeq
    } finally {
      q.stop()
      spark0.catalog.dropTempView(sink)
    }
  }

  private val Gap = 30000L

  test("flushed sessions equal the batch q2 chain — multi-user, " +
    "out-of-order within batches") {
    val evs = Seq(
      Event(1L, 10L, 1000L), Event(1L, 11L, 20000L), // u1 s1
      Event(1L, 12L, 80000L), //                        u1 s2 (gap 60000)
      Event(2L, 20L, 5000L), //                         u2 s1
      Event(2L, 21L, 36000L), //                        u2 s1 (gap 31000>30000? no: 31000 > Gap → s2)
      Event(3L, 30L, 2000L)) //                         u3 s1
    // arrival shuffled within batches; final flush batch advances the
    // watermark beyond every end + gap
    val flush = Seq(Event(99L, 999L, 500000L))
    val got = runBatches(
      Seq(Seq(evs(2), evs(0), evs(4), evs(1), evs(3), evs(5)), flush),
      Gap, delayMs = 1000L, sink = "ssess_sink1")
    val want = refSessions(evs, Gap)
    assert(got.filter(_.userId != 99L).sortBy(s => (s.userId, s.sessionId))
      === want.sortBy(s => (s.userId, s.sessionId)))
  }

  test("a late bridge row merges two provisional sessions exactly as " +
    "the batch sort would") {
    // ts stays above 0: the engine's late-row filter drops events at or
    // below the watermark, and the initial watermark is 0
    val early = Seq(Event(7L, 1L, 1000L), Event(7L, 2L, 61000L))
    val bridge = Seq(Event(7L, 3L, 31000L)) // 31000-1000 ≤ gap, 61000-31000 ≤ gap
    val flush = Seq(Event(99L, 999L, 500000L))
    val got = runBatches(Seq(early, bridge, flush),
      Gap, delayMs = 120000L, sink = "ssess_sink2")
      .filter(_.userId == 7L)
    // ONE session of 3 events spanning [1000, 61000]
    assert(got === Seq(Session(7L, 1L, 3L, 1000L, 61000L)))
    assert(got === refSessions(early ++ bridge, Gap))
  }

  test("ordinals persist across evictions: a session closed by the " +
    "watermark numbers before a later one") {
    val b1 = Seq(Event(5L, 1L, 1000L), Event(5L, 2L, 2000L))
    val b2 = Seq(Event(5L, 3L, 200000L)) // wm → 199000 > 2000+30000: s1 closes
    val flush = Seq(Event(99L, 999L, 500000L))
    val got = runBatches(Seq(b1, b2, flush), Gap, delayMs = 1000L,
      sink = "ssess_sink3").filter(_.userId == 5L)
      .sortBy(_.sessionId)
    assert(got === Seq(
      Session(5L, 1L, 2L, 1000L, 2000L),
      Session(5L, 2L, 1L, 200000L, 200000L)))
  }

  test("arrival-order determinism: shuffled batch contents produce " +
    "identical sessions") {
    val evs = (0 until 40).map { i =>
      Event(i % 4L, i.toLong, 1000L + (i / 4) * 9000L) // per-user 9s steps
    }
    val flush = Seq(Event(99L, 999L, 900000L))
    val a = runBatches(Seq(evs, flush), Gap, 1000L, "ssess_sink4a")
      .filter(_.userId != 99L).sortBy(s => (s.userId, s.sessionId))
    val b = runBatches(Seq(scala.util.Random.shuffle(evs.toList), flush),
      Gap, 1000L, "ssess_sink4b")
      .filter(_.userId != 99L).sortBy(s => (s.userId, s.sessionId))
    assert(a === b)
    assert(a === refSessions(evs, Gap).sortBy(s => (s.userId, s.sessionId)))
  }

  test("mergeSorted: overlap, adjacency at the exact gap, and >gap " +
    "separation") {
    val xs = List(Interval(0L, 0L, 1L), Interval(30000L, 30000L, 1L),
      Interval(60001L, 60001L, 1L))
    // 30000-0 == gap merges; 60001-30000 == gap+1 stays separate
    assert(StreamSessionize.mergeSorted(xs, 30000L) ===
      List(Interval(0L, 30000L, 2L), Interval(60001L, 60001L, 1L)))
    // overlapping intervals collapse with max end
    assert(StreamSessionize.mergeSorted(
      List(Interval(0L, 10000L, 2L), Interval(5000L, 7000L, 1L)), 30000L)
      === List(Interval(0L, 10000L, 3L)))
  }
}
