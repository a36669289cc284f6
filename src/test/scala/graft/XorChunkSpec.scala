package graft

import org.apache.spark.sql.functions._

import graft.functions.XorChunk

/** S6 — Gorilla XOR chunk codec: randomized round-trips (regular scrapes,
  * jitter, counter resets, special doubles), a golden-bytes pin of the
  * bit layout, and the Spark import path (per-series blobs → flat rows).
  */
class XorChunkSpec extends SparkSpec {

  test("round-trip: regular, jittered, constant, and adversarial series") {
    val rnd = new scala.util.Random(7)
    val cases: Seq[Seq[(Long, Double)]] = Seq(
      // regular 15s scrape, slowly-varying gauge
      (0 until 500).map(i => (1704067200000L + i * 15000L,
        100.0 + math.sin(i / 10.0))),
      // jittered timestamps, counter with resets
      { var t = 1704067200000L; var v = 0.0
        (0 until 300).map { i =>
          t += 10000 + rnd.nextInt(500) - 250
          v = if (i % 97 == 0) 0.0 else v + rnd.nextInt(100)
          (t, v)
        } },
      // constant values (pure '0' bits), single sample, two samples
      (0 until 50).map(i => (i * 1000L, 42.0)),
      Seq((123456789L, 3.14)),
      Seq((1000L, 1.0), (2000L, 2.0)),
      // special doubles and huge dod jumps
      Seq((0L, 0.0), (1L, -0.0), (100000000000L, Double.MaxValue),
        (100000000001L, Double.MinPositiveValue), (100000000002L, 1e308)))
    cases.foreach { s =>
      assert(XorChunk.decode(XorChunk.encode(s)) === s, s"case ${s.take(3)}")
    }
    // NaN payloads survive bit-exactly (StaleNaN interop)
    val nan = Seq((0L, java.lang.Double.longBitsToDouble(0x7ff0000000000002L)),
      (1000L, 1.0))
    val back = XorChunk.decode(XorChunk.encode(nan))
    assert(java.lang.Double.doubleToRawLongBits(back.head._2) ===
      0x7ff0000000000002L)
  }

  test("golden bytes: bit layout is pinned") {
    val chunk = XorChunk.encode(Seq((1000L, 1.0), (2000L, 1.0), (3000L, 2.0)))
    // 3 samples; ts=1000 zigzag-varint(2000)=[0xd0,0x0f]; 1.0 raw 64;
    // delta uvarint 1000 = [0xe8,0x07]; same value bit; dod 0 bit;
    // xor(1.0,2.0) window bits
    assert(chunk.take(2).toSeq === Seq[Byte](0, 3))
    assert(XorChunk.decode(chunk) ===
      Seq((1000L, 1.0), (2000L, 1.0), (3000L, 2.0)))
    // snapshot of the full encoding guards bit-layout regressions:
    // ...e807 | '0' same-value | '0' dod=0 | '11' new window, lead=1
    // (5 bits 00001), sig=11 (6 bits 001011), xor>>52 = 0x7FF (11 bits)
    assert(chunk.map(b => f"$b%02x").mkString === (
      "0003d00f3ff0000000000000e8073097ffc0"))
  }

  test("Spark import path: per-series blobs decode to the original rows") {
    import spark.implicits._
    val pts = Tables.points(spark, "/root/testdata/sf0.001")
      .where(col("user_id") < 20)
      .select("user_id", "event_type", "ts_ms", "value")
    // export: encode each series' sorted samples into one blob (S8 shape)
    val encodeUdf = udf((samples: Seq[org.apache.spark.sql.Row]) =>
      XorChunk.encode(samples.map(r => (r.getLong(0), r.getDouble(1)))))
    val blobs = pts
      .groupBy("user_id", "event_type")
      .agg(sort_array(collect_list(struct(col("ts_ms"), col("value"))))
        .as("samples"))
      .withColumn("chunk", encodeUdf(col("samples")))
      .select("user_id", "event_type", "chunk")
    // import: decode blobs back to flat rows (S6 — the legacy-data path)
    val decodeUdf = udf((chunk: Array[Byte]) => XorChunk.decode(chunk))
    val decoded = blobs
      .withColumn("s", explode(decodeUdf(col("chunk"))))
      .select(col("user_id"), col("event_type"),
        col("s._1").as("ts_ms"), col("s._2").as("value"))
    val orig = pts.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val back = decoded.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(back === orig)
  }
}
