package graft.streaming

/** Protobuf wire-format primitives shared by the prompb v1/v2 and OTLP
  * codecs: varint, little-endian fixed64, unknown-field skip, and the
  * writer counterparts. Wire types: 0 varint, 1 fixed64, 2
  * length-delimited, 5 fixed32.
  */
private[streaming] object Wire {

  def varint(b: Array[Byte], from: Int): (Long, Int) = {
    var pos = from
    var shift = 0
    var acc = 0L
    var going = true
    while (going) {
      val x = b(pos)
      acc |= (x & 0x7FL) << shift
      shift += 7
      pos += 1
      going = (x & 0x80) != 0
    }
    (acc, pos)
  }

  def fixed64(b: Array[Byte], from: Int): Long = {
    var acc = 0L
    var i = 7
    while (i >= 0) { acc = (acc << 8) | (b(from + i) & 0xFFL); i -= 1 }
    acc
  }

  def skip(b: Array[Byte], pos: Int, wire: Int): Int = wire match {
    case 0 => varint(b, pos)._2
    case 1 => pos + 8
    case 2 => val (len, p) = varint(b, pos); p + len.toInt
    case 5 => pos + 4
    case other =>
      throw new IllegalArgumentException(s"unsupported wire type $other")
  }

  def writeVarint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  def writeLenDelim(out: java.io.ByteArrayOutputStream, field: Int,
      payload: Array[Byte]): Unit = {
    out.write((field << 3) | 2)
    writeVarint(out, payload.length.toLong)
    out.write(payload)
  }

  def writeFixed64(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    var i = 0
    while (i < 8) { out.write(((v >> (8 * i)) & 0xFF).toInt); i += 1 }
  }
}
