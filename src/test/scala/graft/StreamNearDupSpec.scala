package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamNearDup
import graft.streaming.StreamNearDup.Doc

class StreamNearDupSpec extends SparkSpec {

  // A ~ B on one band, B ~ C on two others, A !~ C — found by search
  // over one-token edits; the precondition test below pins the sharing
  // pattern against the BATCH LSH chain, so a hash-construction change
  // fails loudly there instead of mysteriously here
  private val TextA = "the spark quick the the value stream window lazy " +
    "stream batch dog row fox agg key filter query agg batch window key " +
    "group table stream scan data lazy dog merge lazy key group data " +
    "value filter jumps table sort quick"
  private val TextB = TextA.replaceFirst("window lazy stream", "window the stream")
  private val TextC = TextB.replaceFirst("quick the the value", "quick the filter value")
  private val TextD = "completely unrelated content about nothing shared " +
    "with any other document in this suite at all whatsoever honestly"

  private def runGate(input: MemoryStream[Doc], delayMs: Long)(
      feed: (org.apache.spark.sql.streaming.StreamingQuery,
        ArrayBuffer[(Long, Long)]) => Unit): Seq[(Long, Long)] = {
    val spark0 = spark
    import spark0.implicits._
    val out = ArrayBuffer.empty[(Long, Long)] // (batchId, docId)
    val q = StreamNearDup.verdicts(input.toDS(), delayMs)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val s = StreamNearDup.survivorsBatch(batch)
          .as[(Long, String, Long)].collect().map(_._1)
        out.synchronized { out ++= s.map(id -> _) }
        ()
      }.start()
    try feed(q, out) finally q.stop()
    out.toSeq
  }

  test("precondition: the crafted texts share bands exactly as the chain " +
    "test assumes (vs the batch LSH construction)") {
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq((1L, TextA), (2L, TextB), (3L, TextC), (4L, TextD))
      .toDF("doc_id", "text")
    val b = graft.dedup.Dedup.lshBucketsDirect(docs, 16, 3, 4)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    def shared(x: Long, y: Long): Set[Int] = {
      val bx = b.filter(_._3 == x).map(t => (t._1, t._2)).toSet
      b.filter(_._3 == y).map(t => (t._1, t._2)).toSet.intersect(bx).map(_._1)
    }
    assert(shared(1L, 2L) === Set(0))
    assert(shared(2L, 3L) === Set(1, 2))
    assert(shared(1L, 3L) === Set.empty[Int])
    assert(shared(1L, 4L) === Set.empty[Int])
    assert(shared(2L, 4L) === Set.empty[Int])
    assert(shared(3L, 4L) === Set.empty[Int])
  }

  test("within one batch: near-dup chain collapses to the earliest " +
    "member (d7's cluster-min, online); unrelated doc survives") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark0.sqlContext
    val input = MemoryStream[Doc]
    val got = runGate(input, delayMs = 5000L) { (q, _) =>
      // adversarial order: the latest doc added first
      input.addData(Doc(3L, TextC, 3000L), Doc(1L, TextA, 1000L),
        Doc(4L, TextD, 1500L), Doc(2L, TextB, 2000L))
      q.processAllAvailable()
    }
    // A claims band 0 before B (earlier ts); B still claims bands 1-2
    // by OBSERVATION even though dropped, so C (matching only B) is
    // dropped too — the whole chain keeps exactly its minimum
    assert(got.map(_._2).sorted === Seq(1L, 4L))
  }

  test("across batches: first-arriving claim wins even against an " +
    "earlier event time; within a batch ties break to smallest docId") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark0.sqlContext
    val input = MemoryStream[Doc]
    val got = runGate(input, delayMs = 60000L) { (q, _) =>
      // same ts, same text: smallest docId wins deterministically
      input.addData(Doc(21L, TextA, 5000L), Doc(20L, TextA, 5000L))
      q.processAllAvailable()
      // later batch, EARLIER event time: the standing claim still wins
      input.addData(Doc(19L, TextA, 4000L))
      q.processAllAvailable()
    }
    assert(got.map(_._2).sorted === Seq(20L))
  }

  test("eviction: after the watermark passes claimant ts + delay, the " +
    "same content passes again; sub-shingle docs always bypass") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark0.sqlContext
    val input = MemoryStream[Doc]
    val D = 5000L
    val got = runGate(input, D) { (q, _) =>
      input.addData(Doc(1L, TextA, 10000L), Doc(2L, "a b", 10100L),
        Doc(3L, "a b", 10200L))
      q.processAllAvailable()
      // advance the watermark past 15000 (max event 25000 − 5000)
      input.addData(Doc(4L, TextD, 25000L))
      q.processAllAvailable()
      // the claim was evicted — a re-post of A's content survives
      input.addData(Doc(5L, TextA, 24000L))
      q.processAllAvailable()
    }
    // docs 2 and 3 are both sub-shingle (2 tokens < 3): both bypass —
    // near-dupness is undefined below the window, StreamDedup owns exacts
    assert(got.map(_._2).sorted === Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("streaming buckets are bit-identical to the batch d3 chain") {
    val spark0 = spark
    implicit val sqlCtx = spark0.sqlContext
    import spark0.implicits._
    val input = MemoryStream[Doc]
    val q = StreamNearDup.verdicts(input.toDS(), 5000L)
      .writeStream.outputMode("append").format("memory")
      .queryName("snd_verdicts").start()
    try {
      input.addData(Doc(1L, TextA, 1000L), Doc(2L, TextB, 2000L))
      q.processAllAvailable()
      // every (doc, band) observation present: 4 bands per doc (band -1
      // is the stateless payload row — not a band verdict)
      val rows = spark0.table("snd_verdicts")
        .where("band >= 0")
        .select("docId", "band", "selfClaimed")
        .as[(Long, Int, Boolean)].collect().sortBy(r => (r._1, r._2)).toSeq
      // and exactly one payload row per doc, carrying the text
      val payload = spark0.table("snd_verdicts").where("band = -1")
        .select("docId", "text").as[(Long, String)].collect().sortBy(_._1)
      assert(payload.toSeq === Seq((1L, TextA), (2L, TextB)))
      assert(rows.map(r => (r._1, r._2)) ===
        Seq((1L, 0), (1L, 1), (1L, 2), (1L, 3),
          (2L, 0), (2L, 1), (2L, 2), (2L, 3)))
      // doc 1 claims everything; doc 2 loses exactly band 0 (the shared
      // one, per the precondition test) and claims its other three
      assert(rows.filter(_._1 == 1L).forall(_._3))
      assert(rows.filter(r => r._1 == 2L && !r._3).map(_._2) === Seq(0))
    } finally {
      q.stop()
      spark0.catalog.dropTempView("snd_verdicts")
    }
  }
}
