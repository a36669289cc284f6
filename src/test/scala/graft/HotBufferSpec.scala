package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.HotBuffer.{BufState, Sample}

/** Hot-buffer state semantics: flush-on-horizon with sort + last-write-wins
  * dedup, recent tail retained — the reference's temp-store contract
  * (`batch/batch.go`) as managed streaming state.
  */
class HotBufferSpec extends SparkSpec {

  test("step: flushes old samples sorted+deduped, keeps the hot tail") {
    var stored: Option[BufState] = None
    val state = new FakeGroupState(stored)
    val in = Iterator(
      Sample("a", 3000L, 3.0, 1L),
      Sample("a", 1000L, 1.0, 2L),
      Sample("a", 1000L, 9.0, 3L), // duplicate ts, higher seq wins
      Sample("a", 10000L, 10.0, 4L)) // newest: horizon anchor
    val out = HotBuffer.step(5000L)("a", in, state).toSeq
    // cutoff = 10000-5000: flush ts<5000 → {1000(lww 9.0), 3000}
    assert(out.map(s => (s.tsMs, s.value)) === Seq((1000L, 9.0), (3000L, 3.0)))
    assert(state.updated.get.samples.map(_.tsMs) === List(10000L))
  }

  test("step: second batch flushes previously-buffered samples") {
    val state = new FakeGroupState(
      Some(BufState(List(Sample("a", 10000L, 10.0, 4L)))))
    val out = HotBuffer.step(5000L)("a",
      Iterator(Sample("a", 20000L, 20.0, 5L)), state).toSeq
    assert(out.map(_.tsMs) === Seq(10000L))
    assert(state.updated.get.samples.map(_.tsMs) === List(20000L))
  }

  test("end-to-end: streaming micro-batches through the state store") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark0.sqlContext
    val input = MemoryStream[Sample]
    val q = HotBuffer(input.toDS(), horizonMs = 5000L)
      .writeStream.outputMode("append").format("memory")
      .queryName("hotbuf_sink").start()
    input.addData(
      Sample("a", 1000L, 1.0, 1L), Sample("a", 8000L, 8.0, 2L),
      Sample("b", 1000L, 5.0, 3L))
    q.processAllAvailable()
    input.addData(Sample("a", 20000L, 20.0, 4L))
    q.processAllAvailable()
    val rows = spark0.table("hotbuf_sink").as[Sample].collect()
      .map(s => (s.series, s.tsMs)).sorted.toSeq
    q.stop()
    spark0.catalog.dropTempView("hotbuf_sink")
    // batch1: a's newest 8000 → flush 1000; b: nothing old enough
    // batch2: a's newest 20000 → flush 8000; b untouched
    assert(rows === Seq(("a", 1000L), ("a", 8000L)))
  }
}

/** Minimal GroupState stub for unit-testing the step function. */
class FakeGroupState[S](initial: Option[S])
  extends org.apache.spark.sql.streaming.GroupState[S] {
  var updated: Option[S] = initial
  override def exists: Boolean = updated.isDefined
  override def get: S = updated.get
  override def getOption: Option[S] = updated
  override def update(newState: S): Unit = updated = Some(newState)
  override def remove(): Unit = updated = None
  override def hasTimedOut: Boolean = false
  override def setTimeoutDuration(durationMs: Long): Unit = ()
  override def setTimeoutDuration(duration: String): Unit = ()
  override def setTimeoutTimestamp(timestampMs: Long): Unit = ()
  override def setTimeoutTimestamp(timestampMs: Long, additionalDuration: String): Unit = ()
  override def setTimeoutTimestamp(timestamp: java.sql.Date): Unit = ()
  override def setTimeoutTimestamp(timestamp: java.sql.Date, additionalDuration: String): Unit = ()
  override def getCurrentWatermarkMs(): Long = 0L
  override def getCurrentProcessingTimeMs(): Long = 0L
}
