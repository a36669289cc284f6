package graft.streaming

import graft.streaming.Prompb.PromSeries
import graft.streaming.Wire._

/** Remote-write v2 wire decode (S1): the symbol-table format the reference
  * accepts alongside v1 (`api/api.go:63-66` enables
  * `remoteWriteProtoMsgs{V1, V2}`). Public message shape
  * (`io.prometheus.write.v2.Request`):
  *
  * {{{
  * Request    { repeated string symbols = 4; repeated TimeSeries timeseries = 5; }
  * TimeSeries { repeated uint32 labels_refs = 1 (packed, name/value ref pairs);
  *              repeated Sample samples = 2; }
  * Sample     { double value = 1; int64 timestamp = 2; }
  * }}}
  *
  * Labels are (name-ref, value-ref) pairs into the request-wide symbol
  * table; symbol 0 is the empty string by spec. Metadata is skipped;
  * native-histogram and exemplar entries are COUNTED so the write
  * handler can account for them (PRW 2.0 written-stats headers) instead
  * of losing them silently — the reference errors on histogram samples
  * (`api/remotestorage/write.go:233-252`).
  */
object PrompbV2 {

  /** Decode result + the per-request counts of entries this engine does
    * not store: native-histogram samples and exemplars.
    */
  final case class V2Decode(series: Seq[PromSeries],
      histograms: Int, exemplars: Int)

  def decodeSnappy(payload: Array[Byte]): Seq[PromSeries] =
    decodeRequest(org.xerial.snappy.Snappy.uncompress(payload))

  def decodeSnappyWithStats(payload: Array[Byte]): V2Decode =
    decodeRequestWithStats(org.xerial.snappy.Snappy.uncompress(payload))

  def decodeRequest(bytes: Array[Byte]): Seq[PromSeries] =
    decodeRequestWithStats(bytes).series

  def decodeRequestWithStats(bytes: Array[Byte]): V2Decode = {
    // pass 1: symbols; pass 2: series (refs need the full table)
    val symbols = Seq.newBuilder[String]
    val seriesSpans = Seq.newBuilder[(Int, Int)]
    var pos = 0
    while (pos < bytes.length) {
      val (tag, p1) = varint(bytes, pos)
      ((tag >> 3).toInt, (tag & 7).toInt) match {
        case (4, 2) =>
          val (len, p2) = varint(bytes, p1)
          symbols += new String(bytes, p2, len.toInt, "UTF-8")
          pos = p2 + len.toInt
        case (5, 2) =>
          val (len, p2) = varint(bytes, p1)
          seriesSpans += ((p2, p2 + len.toInt))
          pos = p2 + len.toInt
        case (_, w) => pos = skip(bytes, p1, w)
      }
    }
    val sym = symbols.result().toIndexedSeq
    var nHist = 0
    var nExem = 0
    val series = seriesSpans.result().map { case (from, to) =>
      val (s, h, e) = decodeTimeSeries(bytes, from, to, sym)
      nHist += h; nExem += e
      s
    }
    V2Decode(series, nHist, nExem)
  }

  private def decodeTimeSeries(b: Array[Byte], from: Int, to: Int,
      sym: IndexedSeq[String]): (PromSeries, Int, Int) = {
    var pos = from
    val refs = Seq.newBuilder[Int]
    val samples = Seq.newBuilder[(Long, Double)]
    var nHist = 0
    var nExem = 0
    while (pos < to) {
      val (tag, p1) = varint(b, pos)
      ((tag >> 3).toInt, (tag & 7).toInt) match {
        case (1, 2) => // packed uint32 refs
          val (len, p2) = varint(b, p1)
          var q = p2
          while (q < p2 + len.toInt) {
            val (v, q2) = varint(b, q); refs += v.toInt; q = q2
          }
          pos = p2 + len.toInt
        case (1, 0) => // unpacked ref (legal encoding)
          val (v, p2) = varint(b, p1); refs += v.toInt; pos = p2
        case (2, 2) =>
          val (len, p2) = varint(b, p1)
          samples += decodeSample(b, p2, p2 + len.toInt)
          pos = p2 + len.toInt
        case (3, 2) => // native histogram (io.prometheus.write.v2 field 3)
          val (len, p2) = varint(b, p1)
          nHist += 1
          pos = p2 + len.toInt
        case (4, 2) => // exemplar (field 4)
          val (len, p2) = varint(b, p1)
          nExem += 1
          pos = p2 + len.toInt
        case (_, w) => pos = skip(b, p1, w)
      }
    }
    val labels = refs.result().grouped(2).collect {
      case Seq(n, v) if sym(n).nonEmpty => sym(n) -> sym(v)
    }.toMap
    (PromSeries(labels, samples.result()), nHist, nExem)
  }

  private def decodeSample(b: Array[Byte], from: Int, to: Int): (Long, Double) = {
    var pos = from
    var ts = 0L
    var v = 0.0
    while (pos < to) {
      val (tag, p1) = varint(b, pos)
      ((tag >> 3).toInt, (tag & 7).toInt) match {
        case (1, 1) =>
          v = java.lang.Double.longBitsToDouble(fixed64(b, p1)); pos = p1 + 8
        case (2, 0) => val (t, p2) = varint(b, p1); ts = t; pos = p2
        case (_, w) => pos = skip(b, p1, w)
      }
    }
    (ts, v)
  }

  // --- encoder (tests) ---

  /** Test encoder. `histogramsPerSeries`/`exemplarsPerSeries` emit that
    * many EMPTY Histogram/Exemplar messages per series (all-defaults is
    * valid proto — enough to exercise the receiver's accounting).
    */
  def encodeRequest(series: Seq[PromSeries],
      histogramsPerSeries: Int = 0,
      exemplarsPerSeries: Int = 0): Array[Byte] = {
    // build the symbol table: index 0 = "" by spec
    val syms = scala.collection.mutable.LinkedHashMap[String, Int]("" -> 0)
    def ref(s: String): Int = syms.getOrElseUpdate(s, syms.size)
    val encoded = series.map { ts =>
      val refs = ts.labels.toSeq.sortBy(_._1)
        .flatMap { case (n, v) => Seq(ref(n), ref(v)) }
      (refs, ts.samples)
    }
    val out = new java.io.ByteArrayOutputStream()
    syms.keys.foreach { s =>
      writeLenDelim(out, 4, s.getBytes("UTF-8"))
    }
    encoded.foreach { case (refs, samples) =>
      val tsb = new java.io.ByteArrayOutputStream()
      val packed = new java.io.ByteArrayOutputStream()
      refs.foreach(r => writeVarint(packed, r.toLong))
      writeLenDelim(tsb, 1, packed.toByteArray)
      samples.foreach { case (t, v) =>
        val sb = new java.io.ByteArrayOutputStream()
        sb.write((1 << 3) | 1)
        // raw bits: preserve NaN payloads (StaleNaN markers) on the wire
        val bits = java.lang.Double.doubleToRawLongBits(v)
        var i = 0
        while (i < 8) { sb.write(((bits >> (8 * i)) & 0xFF).toInt); i += 1 }
        sb.write(2 << 3)
        writeVarint(sb, t)
        writeLenDelim(tsb, 2, sb.toByteArray)
      }
      (0 until histogramsPerSeries).foreach(_ =>
        writeLenDelim(tsb, 3, Array.emptyByteArray))
      (0 until exemplarsPerSeries).foreach(_ =>
        writeLenDelim(tsb, 4, Array.emptyByteArray))
      writeLenDelim(out, 5, tsb.toByteArray)
    }
    out.toByteArray
  }

  def encodeSnappy(series: Seq[PromSeries],
      histogramsPerSeries: Int = 0,
      exemplarsPerSeries: Int = 0): Array[Byte] =
    org.xerial.snappy.Snappy.compress(
      encodeRequest(series, histogramsPerSeries, exemplarsPerSeries))





}
