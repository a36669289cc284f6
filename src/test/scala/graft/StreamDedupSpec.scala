package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamDedup
import graft.streaming.StreamDedup.Doc

class StreamDedupSpec extends SparkSpec {

  test("within the watermark window, first-seen wins; after eviction the " +
    "same digest passes again") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark0.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamDedup(input.toDS(), delayMs = 5000L)
      .writeStream.outputMode("append").format("memory")
      .queryName("sdedup_sink").start()
    try {
      // batch 1: docs 1/2 share content — first-seen (doc 1) wins
      input.addData(
        Doc(1L, "hello", 1000L), Doc(2L, "hello", 2000L),
        Doc(3L, "world", 3000L))
      q.processAllAvailable()
      // batch 2: advance the watermark past 1000 + 5000 (wm = 60000-5000)
      input.addData(Doc(4L, "advance", 60000L))
      q.processAllAvailable()
      // batch 3: "hello" state was evicted — the re-crawl passes
      input.addData(Doc(5L, "hello", 70000L))
      q.processAllAvailable()
      val ids = spark0.table("sdedup_sink").as[(Long, String, Long, String)]
        .collect().map(_._1).sorted.toSeq
      assert(ids === Seq(1L, 3L, 4L, 5L))
      // survivors carry the digest the batch d1 pass would compute
      val digests = spark0.table("sdedup_sink")
        .select("digest").distinct().count()
      assert(digests === 3) // hello, world, advance
    } finally {
      q.stop()
      spark0.catalog.dropTempView("sdedup_sink")
    }
  }

  test("exact eviction boundary matches EventTimeTimeout: a re-crawl " +
    "arriving when watermark == winnerTs + delay is still a duplicate") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark0.sqlContext
    val input = MemoryStream[Doc]
    val D = 5000L
    val q = StreamDedup(input.toDS(), delayMs = D)
      .writeStream.outputMode("append").format("memory")
      .queryName("sdedup_bound_sink").start()
    try {
      // winner at ts 10000 → timeout stamp 15000
      input.addData(Doc(1L, "edge", 10000L))
      q.processAllAvailable()
      // push the watermark to EXACTLY 15000 (max event 20000 − D) with
      // an unrelated digest; the engine does NOT fire the timeout at
      // equality — and in the SAME batch a re-crawl of "edge" arrives.
      // The live-branch check must agree with the engine (strict <):
      // the state survives, the re-crawl is dropped.
      input.addData(Doc(2L, "mover", 20000L), Doc(3L, "edge", 14500L))
      q.processAllAvailable()
      // one more millisecond of watermark (> 15000): NOW the digest
      // times out, and a later re-crawl passes
      input.addData(Doc(4L, "mover2", 20001L))
      q.processAllAvailable()
      input.addData(Doc(5L, "edge", 19000L))
      q.processAllAvailable()
      val ids = spark0.table("sdedup_bound_sink")
        .as[(Long, String, Long, String)].collect().map(_._1).sorted.toSeq
      assert(ids === Seq(1L, 2L, 4L, 5L),
        "doc 3 (boundary re-crawl) must be dropped; doc 5 must pass")
    } finally {
      q.stop()
      spark0.catalog.dropTempView("sdedup_bound_sink")
    }
  }

  test("within one micro-batch the winner is deterministic: earliest " +
    "event time, ties by smallest docId — independent of arrival order") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark0.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamDedup(input.toDS(), delayMs = 5000L)
      .writeStream.outputMode("append").format("memory")
      .queryName("sdedup_det_sink").start()
    try {
      // one batch, arrival order adversarial: the later-arriving row of
      // "alpha" has the EARLIER event time (doc 9 must win over doc 10);
      // "beta" ties on event time (doc 11 must win over doc 12)
      input.addData(
        Doc(10L, "alpha", 2000L), Doc(9L, "alpha", 1000L),
        Doc(12L, "beta", 1500L), Doc(11L, "beta", 1500L))
      q.processAllAvailable()
      val ids = spark0.table("sdedup_det_sink").as[(Long, String, Long,
        String)].collect().map(_._1).sorted.toSeq
      assert(ids === Seq(9L, 11L))
    } finally {
      q.stop()
      spark0.catalog.dropTempView("sdedup_det_sink")
    }
  }
}
