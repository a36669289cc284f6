package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.streaming.Wire._

/** Prometheus remote-write v1 wire decode (S1): a hand-rolled protobuf
  * wire-format reader for the public `prompb.WriteRequest` message — the
  * piece the reference gets from its generated protobuf bindings
  * (`api/remotestorage/write.go:80-137`; payload framing `api/api.go:
  * 63-66`: snappy-compressed protobuf). The message shape is public:
  *
  * {{{
  * WriteRequest { repeated TimeSeries timeseries = 1; }
  * TimeSeries   { repeated Label labels = 1; repeated Sample samples = 2; }
  * Label        { string name = 1; string value = 2; }
  * Sample       { double value = 1; int64 timestamp = 2; }
  * }}}
  *
  * Only wire types 0 (varint), 1 (fixed64) and 2 (length-delimited) occur;
  * unknown fields are skipped, so v1 payloads with extra fields (exemplars,
  * metadata) still decode. Snappy block format via the snappy-java that
  * ships with Spark.
  */
object Prompb {

  final case class PromSeries(labels: Map[String, String],
      samples: Seq[(Long, Double)]) // (timestamp ms, value)

  /** One flat decoded sample row — the ingest-projection input schema. */
  final case class PromRow(labels: Map[String, String], ts_ms: Long,
      value: Double)

  def decodeSnappy(payload: Array[Byte]): Seq[PromSeries] =
    decodeWriteRequest(org.xerial.snappy.Snappy.uncompress(payload))

  def decodeWriteRequest(bytes: Array[Byte]): Seq[PromSeries] = {
    val out = Seq.newBuilder[PromSeries]
    var pos = 0
    while (pos < bytes.length) {
      val (tag, p1) = varint(bytes, pos)
      val field = (tag >> 3).toInt
      val wire = (tag & 7).toInt
      if (field == 1 && wire == 2) {
        val (len, p2) = varint(bytes, p1)
        out += decodeTimeSeries(bytes, p2, p2 + len.toInt)
        pos = p2 + len.toInt
      } else pos = skip(bytes, p1, wire)
    }
    out.result()
  }

  private def decodeTimeSeries(b: Array[Byte], from: Int, to: Int): PromSeries = {
    var pos = from
    val labels = Map.newBuilder[String, String]
    val samples = Seq.newBuilder[(Long, Double)]
    while (pos < to) {
      val (tag, p1) = varint(b, pos)
      val field = (tag >> 3).toInt
      val wire = (tag & 7).toInt
      if (wire == 2) {
        val (len, p2) = varint(b, p1)
        field match {
          case 1 => labels += decodeLabel(b, p2, p2 + len.toInt)
          case 2 => samples += decodeSample(b, p2, p2 + len.toInt)
          case _ => ()
        }
        pos = p2 + len.toInt
      } else pos = skip(b, p1, wire)
    }
    PromSeries(labels.result(), samples.result())
  }

  private def decodeLabel(b: Array[Byte], from: Int, to: Int): (String, String) = {
    var pos = from
    var name = ""
    var value = ""
    while (pos < to) {
      val (tag, p1) = varint(b, pos)
      val (len, p2) = varint(b, p1)
      val s = new String(b, p2, len.toInt, "UTF-8")
      if ((tag >> 3) == 1) name = s else value = s
      pos = p2 + len.toInt
    }
    name -> value
  }

  private def decodeSample(b: Array[Byte], from: Int, to: Int): (Long, Double) = {
    var pos = from
    var ts = 0L
    var v = 0.0
    while (pos < to) {
      val (tag, p1) = varint(b, pos)
      (tag >> 3, tag & 7) match {
        case (1, 1) => // double value, fixed64 little-endian
          v = java.lang.Double.longBitsToDouble(fixed64(b, p1)); pos = p1 + 8
        case (2, 0) => val (t, p2) = varint(b, p1); ts = t; pos = p2
        case (_, w) => pos = skip(b, p1, w.toInt)
      }
    }
    (ts, v)
  }




  // --- encoder (tests + the reference's own remote-write client shape) ---

  def encodeWriteRequest(series: Seq[PromSeries]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    series.foreach { ts => writeLenDelim(out, 1, encodeTimeSeries(ts)) }
    out.toByteArray
  }

  def encodeSnappy(series: Seq[PromSeries]): Array[Byte] =
    org.xerial.snappy.Snappy.compress(encodeWriteRequest(series))

  def encodeTimeSeries(ts: PromSeries): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    ts.labels.foreach { case (n, v) =>
      val l = new java.io.ByteArrayOutputStream()
      writeLenDelim(l, 1, n.getBytes("UTF-8"))
      writeLenDelim(l, 2, v.getBytes("UTF-8"))
      writeLenDelim(out, 1, l.toByteArray)
    }
    ts.samples.foreach { case (t, v) =>
      val s = new java.io.ByteArrayOutputStream()
      s.write((1 << 3) | 1) // field 1 fixed64
      // raw bits: doubleToLongBits canonicalizes NaN payloads, which would
      // destroy Prometheus StaleNaN markers (0x7ff0000000000002) in transit
      val bits = java.lang.Double.doubleToRawLongBits(v)
      var i = 0
      while (i < 8) { s.write(((bits >> (8 * i)) & 0xFF).toInt); i += 1 }
      s.write((2 << 3) | 0) // field 2 varint
      writeVarint(s, t)
      writeLenDelim(out, 2, s.toByteArray)
    }
    out.toByteArray
  }



  // --- remote-read framing (S3): ReadRequest/ReadResponse -------------
  //
  // ReadRequest  { repeated Query queries = 1; }
  // Query        { int64 start_timestamp_ms = 1; int64 end_timestamp_ms = 2;
  //                repeated LabelMatcher matchers = 3; }
  // LabelMatcher { Type type = 1 (EQ=0 NEQ=1 RE=2 NRE=3);
  //                string name = 2; string value = 3; }
  // ReadResponse { repeated QueryResult results = 1; }
  // QueryResult  { repeated TimeSeries timeseries = 1; }
  // (reference serves this framing at `api/api.go:58-61`; the selection
  // underneath is the same Search path as every query)

  /** One remote-read Query (prompb/remote.proto). `stepMs`/`func` carry
    * the ReadHints (field 4, prompb/types.proto) Prometheus sends with
    * every select — the reference routes remote reads to pre-aggregated
    * data from exactly these (`api/promql/queryable.go:372`,
    * `cassandra/tsdb/read.go:61`).
    */
  final case class ReadQuery(startMs: Long, endMs: Long,
      matchers: Seq[graft.tsdb.Matcher],
      stepMs: Long = 0L, func: String = "")

  /** ReadRequest.ResponseType (public prompb/remote.proto): SAMPLES buffers
    * one snappy blob; STREAMED_XOR_CHUNKS streams framed chunk batches.
    */
  val ResponseTypeSamples = 0L
  val ResponseTypeStreamedXorChunks = 1L

  final case class ReadRequest(queries: Seq[ReadQuery],
      acceptedResponseTypes: Seq[Long])

  def decodeReadRequest(bytes: Array[Byte]): Seq[ReadQuery] =
    decodeReadRequestFull(bytes).queries

  /** Full ReadRequest decode including `accepted_response_types` (field 2,
    * packed or unpacked repeated enum) — the negotiation the reference's
    * remote-read handler performs (`api/api.go:58-61` passes Prometheus'
    * 1 MiB frame size to the streamed path).
    */
  def decodeReadRequestFull(bytes: Array[Byte]): ReadRequest = {
    val qs = Seq.newBuilder[ReadQuery]
    val accepted = Seq.newBuilder[Long]
    var pos = 0
    while (pos < bytes.length) {
      val (tag, p1) = varint(bytes, pos)
      (tag >> 3, tag & 7) match {
        case (1, 2) =>
          val (len, p2) = varint(bytes, p1)
          qs += decodeQuery(bytes, p2, p2 + len.toInt)
          pos = p2 + len.toInt
        case (2, 0) =>
          val (v, p2) = varint(bytes, p1); accepted += v; pos = p2
        case (2, 2) => // packed
          val (len, p2) = varint(bytes, p1)
          var q = p2
          val end = p2 + len.toInt
          while (q < end) { val (v, q2) = varint(bytes, q); accepted += v; q = q2 }
          pos = end
        case (_, w) => pos = skip(bytes, p1, w.toInt)
      }
    }
    ReadRequest(qs.result(), accepted.result())
  }

  private def decodeQuery(b: Array[Byte], from: Int, to: Int): ReadQuery = {
    var pos = from
    var start = 0L
    var end = 0L
    var stepMs = 0L
    var func = ""
    val ms = Seq.newBuilder[graft.tsdb.Matcher]
    while (pos < to) {
      val (tag, p1) = varint(b, pos)
      (tag >> 3, tag & 7) match {
        case (1, 0) => val (v, p2) = varint(b, p1); start = v; pos = p2
        case (2, 0) => val (v, p2) = varint(b, p1); end = v; pos = p2
        case (3, 2) =>
          val (len, p2) = varint(b, p1)
          ms += decodeMatcher(b, p2, p2 + len.toInt)
          pos = p2 + len.toInt
        case (4, 2) => // ReadHints { step_ms=1, func=2, ... }
          val (len, p2) = varint(b, p1)
          var q = p2
          val hEnd = p2 + len.toInt
          while (q < hEnd) {
            val (htag, q1) = varint(b, q)
            (htag >> 3, htag & 7) match {
              case (1, 0) => val (v, q2) = varint(b, q1); stepMs = v; q = q2
              case (2, 2) =>
                val (flen, q2) = varint(b, q1)
                func = new String(b, q2, flen.toInt, "UTF-8")
                q = q2 + flen.toInt
              case (_, w) => q = skip(b, q1, w.toInt)
            }
          }
          pos = hEnd
        case (_, w) => pos = skip(b, p1, w.toInt)
      }
    }
    ReadQuery(start, end, ms.result(), stepMs, func)
  }

  private def decodeMatcher(b: Array[Byte], from: Int,
      to: Int): graft.tsdb.Matcher = {
    import graft.tsdb._
    var pos = from
    var typ = 0L
    var name = ""
    var value = ""
    while (pos < to) {
      val (tag, p1) = varint(b, pos)
      (tag >> 3, tag & 7) match {
        case (1, 0) => val (v, p2) = varint(b, p1); typ = v; pos = p2
        case (f, 2) =>
          val (len, p2) = varint(b, p1)
          val s = new String(b, p2, len.toInt, "UTF-8")
          if (f == 2) name = s else value = s
          pos = p2 + len.toInt
        case (_, w) => pos = skip(b, p1, w.toInt)
      }
    }
    typ match {
      case 0 => MatchEq(name, value)
      case 1 => MatchNeq(name, value)
      case 2 => MatchRe(name, value)
      case 3 => MatchNre(name, value)
      case other =>
        throw new IllegalArgumentException(s"unknown matcher type $other")
    }
  }

  /** Append one length-delimited field — streamed/incremental response
    * assembly for callers outside this package.
    */
  def appendMessage(out: java.io.ByteArrayOutputStream, field: Int,
      payload: Array[Byte]): Unit =
    writeLenDelim(out, field, payload)

  /** One QueryResult per query, each carrying its matched series. */
  def encodeReadResponse(results: Seq[Seq[PromSeries]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    results.foreach { series =>
      val qr = new java.io.ByteArrayOutputStream()
      series.foreach(ts => writeLenDelim(qr, 1, encodeTimeSeries(ts)))
      writeLenDelim(out, 1, qr.toByteArray)
    }
    out.toByteArray
  }

  /** Decode a ReadResponse back to per-query series (round-trip + client
    * side of the framing).
    */
  def decodeReadResponse(bytes: Array[Byte]): Seq[Seq[PromSeries]] = {
    val out = Seq.newBuilder[Seq[PromSeries]]
    var pos = 0
    while (pos < bytes.length) {
      val (tag, p1) = varint(bytes, pos)
      if ((tag >> 3) == 1 && (tag & 7) == 2) {
        val (len, p2) = varint(bytes, p1)
        // QueryResult payload is shaped exactly like WriteRequest (repeated
        // TimeSeries in field 1), so the same decoder applies
        out += decodeWriteRequest(
          java.util.Arrays.copyOfRange(bytes, p2, p2 + len.toInt))
        pos = p2 + len.toInt
      } else pos = skip(bytes, p1, (tag & 7).toInt)
    }
    out.result()
  }

  def encodeMatcher(m: graft.tsdb.Matcher): Array[Byte] = {
    import graft.tsdb._
    val (typ, name, value) = m match {
      case MatchEq(n, v) => (0, n, v)
      case MatchNeq(n, v) => (1, n, v)
      case MatchRe(n, p) => (2, n, p)
      case MatchNre(n, p) => (3, n, p)
      case other =>
        throw new IllegalArgumentException(s"not a wire matcher: $other")
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(1 << 3); writeVarint(out, typ.toLong)
    writeLenDelim(out, 2, name.getBytes("UTF-8"))
    writeLenDelim(out, 3, value.getBytes("UTF-8"))
    out.toByteArray
  }

  def encodeReadRequest(queries: Seq[ReadQuery],
      acceptedResponseTypes: Seq[Long] = Nil): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    queries.foreach { q =>
      val qb = new java.io.ByteArrayOutputStream()
      qb.write(1 << 3); writeVarint(qb, q.startMs)
      qb.write(2 << 3); writeVarint(qb, q.endMs)
      q.matchers.foreach(m => writeLenDelim(qb, 3, encodeMatcher(m)))
      if (q.stepMs != 0L || q.func.nonEmpty) { // ReadHints
        val hb = new java.io.ByteArrayOutputStream()
        if (q.stepMs != 0L) { hb.write(1 << 3); writeVarint(hb, q.stepMs) }
        if (q.func.nonEmpty)
          writeLenDelim(hb, 2, q.func.getBytes("UTF-8"))
        writeLenDelim(qb, 4, hb.toByteArray)
      }
      writeLenDelim(out, 1, qb.toByteArray)
    }
    acceptedResponseTypes.foreach { t =>
      out.write(2 << 3); writeVarint(out, t)
    }
    out.toByteArray
  }

  // --- streamed chunked remote read (S3 at scale) ----------------------
  //
  // The public Prometheus streamed remote-read protocol
  // (prompb/remote.proto + storage/remote/chunked.go): the response is a
  // sequence of FRAMES, each `uvarint(len(payload))` + 4-byte big-endian
  // CRC32-Castagnoli of the payload + the payload (a marshaled
  // ChunkedReadResponse — NOT snappy-compressed; the XOR chunk data is
  // already compact). The reference serves this with Prometheus' default
  // 1 MiB frame budget (`api/api.go:58-61`).
  //
  // ChunkedReadResponse { repeated ChunkedSeries chunked_series = 1;
  //                       int64 query_index = 2; }
  // ChunkedSeries       { repeated Label labels = 1;
  //                       repeated Chunk chunks = 2; }
  // Chunk               { int64 min_time_ms = 1; int64 max_time_ms = 2;
  //                       Encoding type = 3 (XOR = 1); bytes data = 4; }

  val StreamedChunksContentType =
    "application/x-streamed-protobuf; proto=prometheus.ChunkedReadResponse"

  /** One XOR chunk of a series: time bounds + chunkenc-layout bytes
    * ([[graft.functions.XorChunk]]).
    */
  final case class ChunkMeta(minTimeMs: Long, maxTimeMs: Long,
      data: Array[Byte])

  def encodeChunkedSeries(labels: Map[String, String],
      chunks: Seq[ChunkMeta]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    labels.toSeq.sortBy(_._1).foreach { case (n, v) =>
      val l = new java.io.ByteArrayOutputStream()
      writeLenDelim(l, 1, n.getBytes("UTF-8"))
      writeLenDelim(l, 2, v.getBytes("UTF-8"))
      writeLenDelim(out, 1, l.toByteArray)
    }
    chunks.foreach { c =>
      val cb = new java.io.ByteArrayOutputStream()
      cb.write(1 << 3); writeVarint(cb, c.minTimeMs)
      cb.write(2 << 3); writeVarint(cb, c.maxTimeMs)
      cb.write(3 << 3); writeVarint(cb, 1L) // Encoding.XOR
      writeLenDelim(cb, 4, c.data)
      writeLenDelim(out, 2, cb.toByteArray)
    }
    out.toByteArray
  }

  /** Assemble one frame payload from pre-encoded ChunkedSeries bytes. */
  def encodeChunkedReadResponse(seriesBytes: Seq[Array[Byte]],
      queryIndex: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    seriesBytes.foreach(sb => writeLenDelim(out, 1, sb))
    out.write(2 << 3); writeVarint(out, queryIndex)
    out.toByteArray
  }

  /** Write one streamed frame: uvarint length + big-endian CRC32C +
    * payload.
    */
  def writeChunkedFrame(os: java.io.OutputStream,
      payload: Array[Byte]): Unit = {
    var v = payload.length.toLong
    while ((v & ~0x7FL) != 0) { os.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
    os.write(v.toInt)
    val crc = new java.util.zip.CRC32C()
    crc.update(payload)
    val c = crc.getValue.toInt
    os.write(c >>> 24); os.write((c >>> 16) & 0xFF)
    os.write((c >>> 8) & 0xFF); os.write(c & 0xFF)
    os.write(payload)
  }

  /** Split a framed response body back into CRC-verified payloads (client
    * side / tests).
    */
  def readChunkedFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    var pos = 0
    while (pos < bytes.length) {
      val (len, p1) = varint(bytes, pos)
      val expect =
        ((bytes(p1) & 0xFFL) << 24) | ((bytes(p1 + 1) & 0xFFL) << 16) |
          ((bytes(p1 + 2) & 0xFFL) << 8) | (bytes(p1 + 3) & 0xFFL)
      val start = p1 + 4
      val payload =
        java.util.Arrays.copyOfRange(bytes, start, start + len.toInt)
      val crc = new java.util.zip.CRC32C()
      crc.update(payload)
      require((crc.getValue & 0xFFFFFFFFL) == expect,
        s"chunked frame CRC mismatch at offset $pos")
      out += payload
      pos = start + len.toInt
    }
    out.result()
  }

  /** Decode one frame payload: (query index, series with their chunks). */
  def decodeChunkedReadResponse(payload: Array[Byte])
      : (Long, Seq[(Map[String, String], Seq[ChunkMeta])]) = {
    var qi = 0L
    val series = Seq.newBuilder[(Map[String, String], Seq[ChunkMeta])]
    var pos = 0
    while (pos < payload.length) {
      val (tag, p1) = varint(payload, pos)
      (tag >> 3, tag & 7) match {
        case (1, 2) =>
          val (len, p2) = varint(payload, p1)
          series += decodeChunkedSeries(payload, p2, p2 + len.toInt)
          pos = p2 + len.toInt
        case (2, 0) => val (v, p2) = varint(payload, p1); qi = v; pos = p2
        case (_, w) => pos = skip(payload, p1, w.toInt)
      }
    }
    (qi, series.result())
  }

  private def decodeChunkedSeries(b: Array[Byte], from: Int,
      to: Int): (Map[String, String], Seq[ChunkMeta]) = {
    var pos = from
    val labels = Map.newBuilder[String, String]
    val chunks = Seq.newBuilder[ChunkMeta]
    while (pos < to) {
      val (tag, p1) = varint(b, pos)
      (tag >> 3, tag & 7) match {
        case (1, 2) =>
          val (len, p2) = varint(b, p1)
          labels += decodeLabel(b, p2, p2 + len.toInt)
          pos = p2 + len.toInt
        case (2, 2) =>
          val (len, p2) = varint(b, p1)
          chunks += decodeChunk(b, p2, p2 + len.toInt)
          pos = p2 + len.toInt
        case (_, w) => pos = skip(b, p1, w.toInt)
      }
    }
    (labels.result(), chunks.result())
  }

  private def decodeChunk(b: Array[Byte], from: Int, to: Int): ChunkMeta = {
    var pos = from
    var minT = 0L
    var maxT = 0L
    var data = Array.emptyByteArray
    while (pos < to) {
      val (tag, p1) = varint(b, pos)
      (tag >> 3, tag & 7) match {
        case (1, 0) => val (v, p2) = varint(b, p1); minT = v; pos = p2
        case (2, 0) => val (v, p2) = varint(b, p1); maxT = v; pos = p2
        case (4, 2) =>
          val (len, p2) = varint(b, p1)
          data = java.util.Arrays.copyOfRange(b, p2, p2 + len.toInt)
          pos = p2 + len.toInt
        case (_, w) => pos = skip(b, p1, w.toInt)
      }
    }
    ChunkMeta(minT, maxT, data)
  }

  // --- Spark plumbing ---

  /** Decode a distributed set of snappy remote-write payloads into flat
    * sample rows (labels map, ts_ms, value) — executor-side, set-oriented
    * (the codec boundary is the one legitimate `flatMap` in the ingest
    * path; everything downstream is the verified columnar pipeline,
    * [[Ingest.ingestProjection]] first).
    */
  def decodeDataset(payloads: Dataset[Array[Byte]]): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.flatMap { bytes =>
      decodeSnappy(bytes).flatMap(s =>
        s.samples.map { case (t, v) => PromRow(s.labels, t, v) })
    }.toDF()
  }
}
