package graft

import graft.streaming.Prompb
import graft.streaming.Prompb.PromSeries

/** S1 — remote-write wire decode: golden-byte payload, round-trip, snappy
  * framing, and the Spark ingestion path.
  */
class PrompbSpec extends SparkSpec {

  private val series = Seq(
    PromSeries(
      Map("__name__" -> "http_requests_total", "job" -> "api", "le" -> "0.5"),
      Seq((1704067200000L, 42.5), (1704067215000L, 43.0))),
    PromSeries(
      Map("__name__" -> "up"),
      Seq((1704067200000L, 1.0))))

  test("golden bytes: a hand-assembled WriteRequest decodes correctly") {
    // WriteRequest{ts{label{name:"a" value:"b"} sample{value:1.5 ts:1000}}}
    val golden: Array[Byte] = Array(
      0x0a, 0x16, // field 1 (timeseries), len 22
      0x0a, 0x06, // field 1 (label), len 6
      0x0a, 0x01, 'a'.toInt, // name "a"
      0x12, 0x01, 'b'.toInt, // value "b"
      0x12, 0x0c, // field 2 (sample), len 12
      0x09, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0xf8, 0x3f, // 1.5 LE
      0x10, 0xe8, 0x07 // ts = 1000 (varint e8 07)
    ).map(_.toByte)
    val got = Prompb.decodeWriteRequest(golden)
    assert(got === Seq(PromSeries(Map("a" -> "b"), Seq((1000L, 1.5)))))
  }

  test("round-trip: encode → decode preserves labels and samples") {
    assert(Prompb.decodeWriteRequest(Prompb.encodeWriteRequest(series))
      === series)
  }

  test("snappy framing round-trips, matching the reference's payload form") {
    assert(Prompb.decodeSnappy(Prompb.encodeSnappy(series)) === series)
  }

  test("StaleNaN payload survives encode → decode (v1 and v2, raw bits)") {
    // Prometheus staleness marker: a specific NaN payload that
    // doubleToLongBits would canonicalize away (ADVICE r3; XorChunkSpec
    // guards the same invariant in the chunk codec)
    val staleBits = 0x7ff0000000000002L
    val stale = java.lang.Double.longBitsToDouble(staleBits)
    val s = Seq(PromSeries(Map("__name__" -> "up"),
      Seq((1000L, 1.0), (2000L, stale))))
    def bitsOf(series: Seq[PromSeries]): Seq[Long] =
      series.flatMap(_.samples.map(p =>
        java.lang.Double.doubleToRawLongBits(p._2)))
    assert(bitsOf(Prompb.decodeWriteRequest(Prompb.encodeWriteRequest(s)))
      === Seq(java.lang.Double.doubleToRawLongBits(1.0), staleBits))
    assert(bitsOf(graft.streaming.PrompbV2.decodeRequest(
      graft.streaming.PrompbV2.encodeRequest(s)))
      === Seq(java.lang.Double.doubleToRawLongBits(1.0), staleBits))
  }

  test("unknown fields are skipped (v1 payloads with exemplars decode)") {
    // append an unknown length-delimited field 3 to a TimeSeries
    val base = Prompb.encodeWriteRequest(Seq(series.head))
    // outer: rewrap with an extra unknown varint field 7 at top level
    val extra = base ++ Array[Byte](0x38, 0x05) // field 7 varint = 5
    assert(Prompb.decodeWriteRequest(extra) === Seq(series.head))
  }

  test("remote-read framing: request decode drives Search, response round-trips") {
    import graft.streaming.Prompb.ReadQuery
    import graft.tsdb._
    import org.apache.spark.sql.functions._
    val req = Seq(ReadQuery(1704067200000L, 1704153600000L, Seq(
      MatchEq("event_type", "click"), MatchNeq("user", "42"),
      MatchRe("job", "a|b"), MatchNre("env", "dev.*"))))
    val decoded = Prompb.decodeReadRequest(Prompb.encodeReadRequest(req))
    assert(decoded === req)
    // the decoded matchers ARE the Search input: compile to a predicate
    // over the events table and select series — the same path as queries
    val q = decoded.head
    val resolve: String => org.apache.spark.sql.Column = {
      case "event_type" => col("event_type")
      case "user" => col("user_id").cast("string")
    }
    val matched = Tables.points(spark, "/root/testdata/sf0.001")
      .where(Matchers.all(resolve, q.matchers.take(2)) &&
        col("ts_ms").between(q.startMs, q.endMs))
    assert(matched.count() > 0)
    assert(matched.where(col("event_type") =!= "click").count() === 0L)
    // response: series stream → proto frames → decode equals input
    val resp = Prompb.decodeReadResponse(Prompb.encodeReadResponse(
      Seq(series, Seq.empty, series.take(1))))
    assert(resp === Seq(series, Seq.empty, series.take(1)))
  }

  test("remote-write v2: symbol-table payloads decode to the same series") {
    import graft.streaming.PrompbV2
    val got = PrompbV2.decodeSnappy(PrompbV2.encodeSnappy(series))
    assert(got === series)
    // shared symbols are deduplicated on the wire but decode identically
    val shared = Seq(
      PromSeries(Map("__name__" -> "up", "job" -> "api"), Seq((1L, 1.0))),
      PromSeries(Map("__name__" -> "up", "job" -> "web"), Seq((2L, 0.0))))
    assert(PrompbV2.decodeRequest(PrompbV2.encodeRequest(shared)) === shared)
  }

  test("OTLP: gauge datapoints translate to Prometheus series") {
    import graft.streaming.Otlp
    import graft.streaming.Otlp.OtlpPoint
    val payload = Otlp.encodeExportRequest("checkout", "host-1", Seq(
      OtlpPoint("http.requests", Map("http.method" -> "GET"),
        1704067200000000000L, 42.0),
      OtlpPoint("queue_depth", Map.empty, 1704067215000000000L, 7.0)))
    val got = Otlp.decodeExportRequest(payload)
    assert(got.size === 2)
    val byName = got.map(s => s.labels("__name__") -> s).toMap
    // attribute keys sanitized, resource attrs → job/instance, ns → ms
    val req = byName("http_requests")
    assert(req.labels === Map("__name__" -> "http_requests",
      "job" -> "checkout", "instance" -> "host-1", "http_method" -> "GET"))
    assert(req.samples === Seq((1704067200000L, 42.0)))
    assert(byName("queue_depth").samples === Seq((1704067215000L, 7.0)))
    // decoded OTLP rows feed the same label-map ingest path
    import spark.implicits._
    val rows = got.flatMap(s => s.samples.map { case (t, v) =>
      (s.labels, t, v) }).toDF("labels", "ts_ms", "value")
    val ingested = graft.streaming.Ingest
      .ingestLabeled(rows, "__account_id__", "t1")
    assert(ingested.count() === 2)
  }

  test("decodeDataset: distributed decode feeds the ingest projection") {
    import spark.implicits._
    val payloads = Seq(Prompb.encodeSnappy(series)).toDS()
    val rows = Prompb.decodeDataset(payloads)
    assert(rows.count() === 3)
    val first = rows.where($"value" === 42.5).head()
    assert(first.getAs[Map[String, String]]("labels")("job") === "api")
    assert(first.getAs[Long]("ts_ms") === 1704067200000L)
    // negative and special doubles survive the fixed64 path
    val weird = Seq(PromSeries(Map("m" -> "x"),
      Seq((1L, -0.0), (2L, Double.MaxValue), (3L, 1e-308))))
    assert(Prompb.decodeSnappy(Prompb.encodeSnappy(weird)) === weird)
  }

  test("ReadRequest accepted_response_types round-trips (packed + unpacked)") {
    val q = Prompb.ReadQuery(1000L, 2000L,
      Seq(graft.tsdb.MatchEq("__name__", "up")))
    val req = Prompb.decodeReadRequestFull(
      Prompb.encodeReadRequest(Seq(q),
        Seq(Prompb.ResponseTypeStreamedXorChunks)))
    assert(req.queries === Seq(q))
    assert(req.acceptedResponseTypes ===
      Seq(Prompb.ResponseTypeStreamedXorChunks))
    // packed form (wire type 2 on field 2): bytes 12 02 00 01
    val packed = Prompb.encodeReadRequest(Seq(q)) ++
      Array[Byte](0x12, 0x02, 0x00, 0x01)
    assert(Prompb.decodeReadRequestFull(packed).acceptedResponseTypes ===
      Seq(0L, 1L))
  }

  test("chunked read frames: CRC-verified round-trip; corruption detected") {
    val samples = (0 until 250).map(i => (1000L + i * 15000L, i * 1.5))
    val chunks = samples.grouped(120).map(g =>
      Prompb.ChunkMeta(g.head._1, g.last._1,
        graft.functions.XorChunk.encode(g.toSeq))).toSeq
    val labels = Map("__name__" -> "up", "job" -> "api")
    val payload = Prompb.encodeChunkedReadResponse(
      Seq(Prompb.encodeChunkedSeries(labels, chunks)), 3L)
    val os = new java.io.ByteArrayOutputStream()
    Prompb.writeChunkedFrame(os, payload)
    Prompb.writeChunkedFrame(os, payload) // two frames in one body
    val frames = Prompb.readChunkedFrames(os.toByteArray)
    assert(frames.size === 2)
    val (qi, series) = Prompb.decodeChunkedReadResponse(frames.head)
    assert(qi === 3L)
    assert(series.size === 1)
    assert(series.head._1 === labels)
    val roundTripped = series.head._2.flatMap(c =>
      graft.functions.XorChunk.decode(c.data))
    assert(roundTripped === samples)
    // flipping one payload byte must fail the CRC check
    val corrupt = os.toByteArray
    corrupt(10) = (corrupt(10) ^ 0xFF).toByte
    assertThrows[IllegalArgumentException](Prompb.readChunkedFrames(corrupt))
  }
}
