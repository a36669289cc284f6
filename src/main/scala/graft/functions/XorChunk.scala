package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Gorilla XOR chunk codec (S6): the reference stores points as
  * Prometheus XOR-chunk blobs (`cassandra/tsdb/write.go:429-452` encodes
  * via `prometheus/tsdb/chunkenc`; `read.go:513-545` decodes). Parquet
  * encodings subsume this for the engine's OWN storage (SURVEY §2.1 S6) —
  * this codec exists for bit-level import/export interchange with stores
  * that hold chunk blobs, following the published scheme (Gorilla paper
  * §4.1; chunkenc's bit layout):
  *
  *  - header: 2-byte big-endian sample count;
  *  - sample 0: timestamp as zigzag varint (bytes in the bitstream),
  *    value as raw 64 bits;
  *  - sample 1: timestamp delta as uvarint, value XOR-encoded;
  *  - samples ≥2: delta-of-delta with prefix codes '0' (dod=0),
  *    '10'+14 bits, '110'+17 bits, '1110'+20 bits, '1111'+64 bits
  *    (n-bit payloads two's-complement); values XOR-encoded: '0' (same),
  *    '10' (reuse previous leading/trailing window), '11' + 5-bit leading
  *    + 6-bit significant-bit count (64 encoded as 0) + significant bits.
  *
  * Bits are MSB-first within bytes, matching the Go bstream.
  */
object XorChunk {

  final class BitWriter {
    private val bytes = ArrayBuffer.empty[Byte]
    private var bitPos = 8 // next free bit in the last byte (8 = full)

    def writeBit(b: Boolean): Unit = {
      if (bitPos == 8) { bytes += 0; bitPos = 0 }
      if (b) bytes(bytes.length - 1) =
        (bytes(bytes.length - 1) | (0x80 >>> bitPos)).toByte
      bitPos += 1
    }

    def writeBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { writeBit(((v >>> i) & 1L) != 0); i -= 1 }
    }

    def writeByte(b: Int): Unit = writeBits(b & 0xFFL, 8)

    def writeUvarint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7FL) != 0) { writeByte(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
      writeByte(v.toInt)
    }

    def writeVarint(v: Long): Unit = // zigzag
      writeUvarint((v << 1) ^ (v >> 63))

    def result(): Array[Byte] = bytes.toArray
  }

  final class BitReader(bytes: Array[Byte], start: Int) {
    private var pos = start * 8

    def readBit(): Boolean = {
      val b = (bytes(pos >> 3) & (0x80 >>> (pos & 7))) != 0
      pos += 1
      b
    }

    def readBits(n: Int): Long = {
      var acc = 0L
      var i = 0
      while (i < n) { acc = (acc << 1) | (if (readBit()) 1L else 0L); i += 1 }
      acc
    }

    def readByte(): Int = readBits(8).toInt

    def readUvarint(): Long = {
      var acc = 0L
      var shift = 0
      var going = true
      while (going) {
        val x = readByte()
        acc |= (x & 0x7FL) << shift
        shift += 7
        going = (x & 0x80) != 0
      }
      acc
    }

    def readVarint(): Long = {
      val u = readUvarint()
      (u >>> 1) ^ -(u & 1)
    }
  }

  /** Encode (ts ms, value) samples, sorted by ts, into a chunk blob. */
  def encode(samples: Seq[(Long, Double)]): Array[Byte] = {
    require(samples.size <= 0xFFFF, "chunk overflow")
    val w = new BitWriter
    w.writeByte(samples.size >> 8)
    w.writeByte(samples.size & 0xFF)
    var prevTs = 0L
    var prevDelta = 0L
    var prevBits = 0L
    var prevLead = -1
    var prevTrail = 0
    samples.zipWithIndex.foreach { case ((t, v), i) =>
      // RAW bits: doubleToLongBits canonicalizes NaN payloads, which
      // would destroy StaleNaN markers in transit
      val bits = java.lang.Double.doubleToRawLongBits(v)
      if (i == 0) {
        w.writeVarint(t)
        w.writeBits(bits, 64)
      } else {
        if (i == 1) {
          prevDelta = t - prevTs
          w.writeUvarint(prevDelta)
        } else {
          val delta = t - prevTs
          val dod = delta - prevDelta
          prevDelta = delta
          if (dod == 0) w.writeBit(false)
          else if (-8191 <= dod && dod <= 8192) {
            w.writeBits(0x2, 2); w.writeBits(dod & 0x3FFF, 14)
          } else if (-65535 <= dod && dod <= 65536) {
            w.writeBits(0x6, 3); w.writeBits(dod & 0x1FFFF, 17)
          } else if (-524287 <= dod && dod <= 524288) {
            w.writeBits(0xE, 4); w.writeBits(dod & 0xFFFFF, 20)
          } else {
            w.writeBits(0xF, 4); w.writeBits(dod, 64)
          }
        }
        // value: XOR against the previous sample
        val xor = bits ^ prevBits
        if (xor == 0) w.writeBit(false)
        else {
          w.writeBit(true)
          var lead = java.lang.Long.numberOfLeadingZeros(xor)
          val trail = java.lang.Long.numberOfTrailingZeros(xor)
          if (lead >= 32) lead = 31 // 5-bit field
          if (prevLead != -1 && lead >= prevLead && trail >= prevTrail) {
            // fits the previous window: '0' + significant bits
            w.writeBit(false)
            w.writeBits(xor >>> prevTrail, 64 - prevLead - prevTrail)
          } else {
            prevLead = lead
            prevTrail = trail
            val sig = 64 - lead - trail
            w.writeBit(true)
            w.writeBits(lead.toLong, 5)
            w.writeBits(sig & 0x3F, 6) // 64 encodes as 0
            w.writeBits(xor >>> trail, sig)
          }
        }
      }
      prevTs = t
      prevBits = bits
    }
    w.result()
  }

  /** Decode a chunk blob back to (ts ms, value) samples. */
  def decode(chunk: Array[Byte]): Seq[(Long, Double)] = {
    val n = ((chunk(0) & 0xFF) << 8) | (chunk(1) & 0xFF)
    val r = new BitReader(chunk, 2)
    val out = ArrayBuffer.empty[(Long, Double)]
    var ts = 0L
    var delta = 0L
    var bits = 0L
    var lead = 0
    var trail = 0
    var i = 0
    while (i < n) {
      if (i == 0) {
        ts = r.readVarint()
        bits = r.readBits(64)
      } else {
        if (i == 1) {
          delta = r.readUvarint()
          ts += delta
        } else {
          // delta-of-delta prefix code
          var dod = 0L
          if (r.readBit()) {
            if (!r.readBit()) dod = signed(r.readBits(14), 14)
            else if (!r.readBit()) dod = signed(r.readBits(17), 17)
            else if (!r.readBit()) dod = signed(r.readBits(20), 20)
            else dod = r.readBits(64)
          }
          delta += dod
          ts += delta
        }
        if (r.readBit()) { // value changed
          if (r.readBit()) { // new window
            lead = r.readBits(5).toInt
            var sig = r.readBits(6).toInt
            if (sig == 0) sig = 64
            trail = 64 - lead - sig
          }
          val sig = 64 - lead - trail
          bits ^= r.readBits(sig) << trail
        }
      }
      out += ((ts, java.lang.Double.longBitsToDouble(bits)))
      i += 1
    }
    out.toSeq
  }

  private def signed(v: Long, n: Int): Long =
    if (v > (1L << (n - 1))) v - (1L << n) else v
}
