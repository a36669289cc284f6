package graft

import org.apache.spark.sql.functions._

import graft.streaming.Ingest
import graft.tsdb.{PointOps, RangeWindows}

/** Ingest projection + batch backdating (reference
  * `api/fake_remote_writer.go:236-285`): if ANY sample trips the
  * future threshold, ALL samples in the batch shift by the fixed offset.
  */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  private val now = 1000000L

  test("no sample trips the threshold: batch untouched") {
    val df = Seq((1L, 900000L), (2L, now + 539999L))
      .toDF("event_id", "ts_ms").withColumn("event_type", lit("x"))
    val out = Ingest.backdateBatch(df, 540000L, 600000L, now)
      .select("event_id", "ts_ms").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out === Map(1L -> 900000L, 2L -> (now + 539999L)))
  }

  test("one future sample backdates the WHOLE batch by the fixed offset") {
    val df = Seq((1L, 900000L), (2L, now + 540000L))
      .toDF("event_id", "ts_ms").withColumn("event_type", lit("x"))
    val out = Ingest.backdateBatch(df, 540000L, 600000L, now)
      .select("event_id", "ts_ms").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // relative ordering preserved: both shifted by exactly offsetMs
    assert(out === Map(1L -> 300000L, 2L -> (now - 60000L)))
  }

  test("ingest projection injects tenant and drops empty-label samples") {
    val df = Seq(("a", 1.0), ("", 2.0), (null.asInstanceOf[String], 3.0))
      .toDF("event_type", "value")
    val out = Ingest.ingestProjection(df, "acme")
    assert(out.count() === 1L)
    assert(out.select("tenant").head().getString(0) === "acme")
  }
}

/** Multimodal typed-Dataset decode path: partition-at-a-time batching
  * with the (clearly stubbed) codec — the plan shape of real decoders.
  */
class IngestLabeledSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("label-map ingest: validation, tenant injection, canonical series key") {
    val rows = Seq(
      // valid series; client-supplied tenant must be overwritten
      (Map("__name__" -> "up", "job" -> "api", "__account_id__" -> "evil"),
        1000L, 1.0),
      // empty-valued label dropped from the set, sample kept
      (Map("__name__" -> "up", "job" -> "api", "env" -> ""), 2000L, 2.0),
      // no __name__ → rejected
      (Map("job" -> "api"), 3000L, 3.0),
      // '|' in a label name → rejected (the one character the
      // reference's UTF8Validation forbids, write.go:182-216)
      (Map("__name__" -> "up", "bad|name" -> "x"), 4000L, 4.0),
      // any other UTF-8 name is legal since UTF8Validation
      // (types/types.go:197) — colons included
      (Map("__name__" -> "up", "name:space" -> "x"), 5000L, 5.0),
      // C0 controls are rejected even when TRAILING: an anchored rlike
      // ('$') matches before a final line terminator, so "name\n" used
      // to slip past executor-side validation while the driver-side
      // mirror rejected it (ADVICE r8)
      (Map("__name__" -> "up", "trail\n" -> "x"), 6000L, 6.0),
      (Map("__name__" -> "up\r", "job" -> "api"), 7000L, 7.0))
      .toDF("labels", "ts_ms", "value")
    val out = graft.streaming.Ingest
      .ingestLabeled(rows, "__account_id__", "acme")
    val got = out.select("ts_ms", "labels").collect()
      .map(r => r.getLong(0) -> r.getAs[Map[String, String]]("labels")).toMap
    assert(got.keySet === Set(1000L, 2000L, 5000L))
    assert(got(1000L)("__account_id__") === "acme")
    assert(!got(2000L).contains("env"))
    assert(got(5000L)("name:space") === "x")
    // the first two survivors normalize to the SAME label set → same
    // metric_id (the colon-labeled one is its own series), and it matches
    // the column-path canonical hash of the same labels
    val ids = out.where(col("ts_ms") < 5000L)
      .select("metric_id").distinct().collect().map(_.getLong(0))
    assert(ids.length === 1)
    val colPath = Seq(("up", "api", "acme"))
      .toDF("__name__", "job", "__account_id__")
      .select(xxhash64(graft.tsdb.SeriesDim.canonical(
        Seq("__name__", "job", "__account_id__"))).as("id"))
      .head().getLong(0)
    assert(ids.head === colPath)
  }

  test("canonical: null/empty column labels hash like an absent map entry") {
    // a column-labeled table with env NULL or '' must produce the same
    // metric_id as a map-labeled stream that simply lacks env — the
    // 'agree on series identity' invariant behind Store.upsertSeries and
    // Ingest.ingestLabeled (ADVICE r3: omission, not sentinels)
    val cols = Seq("__name__", "job", "env")
    val colIds = Seq(("up", "api", null: String), ("up", "api", ""))
      .toDF(cols: _*)
      .select(xxhash64(graft.tsdb.SeriesDim.canonical(cols)).as("id"))
      .collect().map(_.getLong(0)).toSet
    val mapId = Seq(Map("__name__" -> "up", "job" -> "api"))
      .toDF("labels")
      .select(xxhash64(
        graft.tsdb.SeriesDim.canonicalMap(col("labels"))).as("id"))
      .head().getLong(0)
    assert(colIds === Set(mapId))
    // and omission stays unambiguous: a present pair never collides with
    // an absent one
    val withEnv = Seq(("up", "api", "prod")).toDF(cols: _*)
      .select(xxhash64(graft.tsdb.SeriesDim.canonical(cols)).as("id"))
      .head().getLong(0)
    assert(withEnv !== mapId)
  }

  test("wire → ingest: prompb payload lands with canonical series keys") {
    import graft.streaming.Prompb
    import graft.streaming.Prompb.PromSeries
    val payload = Prompb.encodeSnappy(Seq(
      PromSeries(Map("__name__" -> "up", "job" -> "api"),
        Seq((1000L, 1.0), (2000L, 0.0)))))
    val decoded = Prompb.decodeDataset(Seq(payload).toDS())
    val out = graft.streaming.Ingest
      .ingestLabeled(decoded, "__account_id__", "t1")
    assert(out.count() === 2)
    assert(out.select("metric_id").distinct().count() === 1)
  }
}

class MultimodalSpec extends SparkSpec {
  import graft.multimodal.Multimodal

  test("decodeFeatures streams partitions through the codec, one row each") {
    val spark0 = spark
    import spark0.implicits._
    val assets = Seq(
      Multimodal.Asset(1L, Array[Byte](1, 2, 3, 4)),
      Multimodal.Asset(2L, Array.empty[Byte])).toDS()
    val out = Multimodal.decodeFeatures(assets).collect()
      .map(f => f.asset_id -> f).toMap
    assert(out.size === 2)
    // deterministic stub features: reproducible across runs/partitions
    val f1 = out(1L)
    assert(f1.width === 16 + 4 % 64 && f1.meanLuma > 0)
    assert(out(2L).meanLuma === 0.0)
  }

  /** Little-endian byte helpers for hand-assembled containers. */
  private def le16(v: Int): Seq[Byte] =
    Seq((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32(v: Int): Seq[Byte] = le16(v & 0xFFFF) ++ le16(v >>> 16)

  /** 2×2 24bpp BMP: top row white, bottom row black → mean luma 0.5. */
  private def bmp2x2: Array[Byte] = {
    val rowUp = Seq.fill(2)(Seq[Byte](0, 0, 0)).flatten ++ Seq[Byte](0, 0)
    val rowTop = Seq.fill(2)(Seq[Byte](-1, -1, -1)).flatten ++ Seq[Byte](0, 0)
    val pixels = rowUp ++ rowTop // bottom-up storage
    (Seq('B'.toByte, 'M'.toByte) ++ le32(54 + pixels.size) ++ le32(0) ++
      le32(54) ++ // pixel offset
      le32(40) ++ le32(2) ++ le32(2) ++ le16(1) ++ le16(24) ++ le32(0) ++
      le32(pixels.size) ++ le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0) ++
      pixels).toArray
  }

  /** Mono 8 kHz 16-bit PCM WAV, 8 samples at ±0.5 → RMS 0.5, 1 ms. */
  private def wavMono: Array[Byte] = {
    val samples = (0 until 8).flatMap(i =>
      le16(if (i % 2 == 0) 16384 else -16384 & 0xFFFF))
    val fmt = le16(1) ++ le16(1) ++ le32(8000) ++ le32(16000) ++
      le16(2) ++ le16(16)
    val body = "WAVE".getBytes("US-ASCII").toSeq ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++ fmt ++
      "data".getBytes("US-ASCII") ++ le32(samples.size) ++ samples
    ("RIFF".getBytes("US-ASCII").toSeq ++ le32(body.size) ++ body).toArray
  }

  test("decodeMedia parses real BMP and WAV containers; opaque falls back") {
    val spark0 = spark
    import spark0.implicits._
    val assets = Seq(
      Multimodal.Asset(1L, bmp2x2),
      Multimodal.Asset(2L, wavMono),
      Multimodal.Asset(3L, Array[Byte](9, 9, 9, 9))).toDS()
    val out = Multimodal.decodeMedia(assets).collect()
      .map(f => f.asset_id -> f).toMap
    val img = out(1L)
    assert(img.kind === "bmp" && img.width === 2 && img.height === 2)
    assert(math.abs(img.meanLevel - 0.5) < 1e-9) // half white, half black
    val snd = out(2L)
    assert(snd.kind === "wav" && snd.channels === 1 && snd.sampleRate === 8000)
    assert(math.abs(snd.durationMs - 1.0) < 1e-9) // 8 frames @ 8 kHz
    assert(math.abs(snd.meanLevel - 0.5) < 1e-9) // constant ±0.5 → RMS 0.5
    assert(out(3L).kind === "opaque")
  }

  test("imageDHash: exact copies collide, gradients set the expected " +
    "bits, one-pixel retouches stay within Hamming 1") {
    val spark0 = spark
    import spark0.implicits._
    // a left-to-right brightness ramp: every adjacent-column comparison
    // is right>left → all bits UNSET; the vertical ramp flips none either
    val ramp = Multimodal.BmpCodec.encode(16, 8,
      (x, _) => (x * 16, x * 16, x * 16))
    val rampRev = Multimodal.BmpCodec.encode(16, 8,
      (x, _) => (240 - x * 16, 240 - x * 16, 240 - x * 16))
    val retouch = Multimodal.BmpCodec.encode(16, 8,
      (x, y) => if (x == 0 && y == 0) (1, 0, 0)
        else (x * 16, x * 16, x * 16))
    val assets = Seq(
      Multimodal.Asset(1L, ramp), Multimodal.Asset(2L, ramp),
      Multimodal.Asset(3L, rampRev), Multimodal.Asset(4L, retouch)).toDS()
    val got = Multimodal.imageDHash(assets, gw = 3, gh = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got(1L) === got(2L)) // exact copy → identical hash
    assert(got(1L) === 0L) // ascending ramp: left < right everywhere
    assert(got(3L) === (1L << 12) - 1) // descending ramp: all 12 bits
    // a one-pixel +1 in a 4×2-pixel cell cannot flip a 16-luma-unit
    // margin: distance 0 — and never more than the one affected bit
    assert(java.lang.Long.bitCount(got(1L) ^ got(4L)) <= 1)
    assert(got(4L) === got(1L))
  }

  test("audioFingerprint: energy-contour bits, exact re-encode collides") {
    val spark0 = spark
    import spark0.implicits._
    // amplitude staircase over 8 blocks of 8 samples (alternating sign
    // so the waveform is a real oscillation, energy still monotone)
    def stair(asc: Boolean): Array[Byte] = Multimodal.WavCodec.encode(8000,
      (0 until 64).map { i =>
        val blk = i / 8
        val amp = (if (asc) blk + 1 else 8 - blk) * 100
        if (i % 2 == 0) amp else -amp
      })
    val assets = Seq(
      Multimodal.Asset(1L, stair(asc = true)),
      Multimodal.Asset(2L, stair(asc = true)),
      Multimodal.Asset(3L, stair(asc = false))).toDS()
    val got = Multimodal.audioFingerprint(assets, blocks = 8).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got(1L) === got(2L)) // byte-identical re-encode
    assert(got(1L) === (1L << 7) - 1) // ascending: all 7 deltas positive
    assert(got(3L) === 0L) // descending: none
  }

  test("audioFingerprint mean compare survives 64-bit product overflow " +
    "(ADVICE r13): blocks large enough that sum·cnt wraps a Long") {
    val spark0 = spark
    import spark0.implicits._
    // two blocks of 260k samples at amplitudes 30000 / 32767: each
    // block's energy sum ≈ 2^47.8, so sum·cnt ≈ 2^65.8 wraps a Long —
    // and for THESE values the wrapped signed compare gives the WRONG
    // answer (verified below), while block 1's true mean energy is
    // strictly higher, so exact arithmetic must set bit 0
    val c = 260000
    val samples = new Array[Int](2 * c)
    var i = 0
    while (i < 2 * c) {
      val amp = if (i < c) 30000 else 32767
      samples(i) = if (i % 2 == 0) amp else -amp
      i += 1
    }
    val wav = Multimodal.WavCodec.encode(8000,
      scala.collection.immutable.ArraySeq.unsafeWrapArray(samples))
    // the guard that proves this test bites: the naive 64-bit
    // cross-multiply disagrees with exact (BigInt) arithmetic here
    val s0 = c.toLong * 30000L * 30000L
    val s1 = c.toLong * 32767L * 32767L
    assert((BigInt(s1) * c > BigInt(s0) * c) !== (s1 * c > s0 * c),
      "test data must trigger the 64-bit wrap")
    val got = Multimodal.audioFingerprint(
      Seq(Multimodal.Asset(1L, wav)).toDS(), blocks = 2).collect()
    assert(got.length === 1)
    assert(got(0).getLong(3) === 1L) // bit 0 set: block 1 louder, exactly
  }

  test("hammingNearDupPairs: exact recall within maxHamming (pigeonhole), " +
    "shared-band-but-over-threshold pairs verified OUT, sign-bit band ok") {
    val spark0 = spark
    import spark0.implicits._
    val hs = Seq(
      1L -> 0L, 2L -> 0L, // exact dup
      3L -> 1L, // distance 1 from 0
      // 3 bits spread over bands 0/1/2; band 3 still matches hash 0,
      // so 1↔4 candidates through band 3 and verifies IN at distance 3
      4L -> ((1L << 1) | (1L << 17) | (1L << 33)),
      // one more bit in band 3: 4↔5 at distance 1; 1↔5 shares NO band
      // (one differing bit in each) AND is over threshold — never a pair
      5L -> ((1L << 1) | (1L << 17) | (1L << 33) | (1L << 49)),
      6L -> -1L, // all-ones, far from everything above
      7L -> (-1L ^ (1L << 63)) // distance 1 from 6 through the sign bit
    ).toDF("id", "h")
    val got = Multimodal.hammingNearDupPairs(hs, "id", "h",
        bands = 4, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 2L, 0L), (1L, 3L, 1L), (2L, 3L, 1L),
      (1L, 4L, 3L), (2L, 4L, 3L), (4L, 5L, 1L), (6L, 7L, 1L)))
    // the recall-1 precondition is enforced, not assumed
    intercept[IllegalArgumentException] {
      Multimodal.hammingNearDupPairs(hs, "id", "h", bands = 3,
        maxHamming = 3)
    }
  }
}

class PointOpsSpec extends SparkSpec {
  import spark.implicits._

  test("hotColdMerge: cold truncated at first hot ts per series; " +
    "series without hot data keep full cold history") {
    val cold = Seq((1L, 10L, 1.0), (1L, 20L, 2.0), (1L, 30L, 3.0),
      (2L, 10L, 9.0)).toDF("sid", "ts_ms", "value")
    val hot = Seq((1L, 20L, 2.5), (1L, 40L, 4.0)).toDF("sid", "ts_ms", "value")
    val out = PointOps.hotColdMerge(cold, hot, Seq("sid"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // series 1: cold ts<20 kept (10), hot 20(→2.5),40; series 2: all cold
    assert(out === Set((1L, 10L, 1.0), (1L, 20L, 2.5), (1L, 40L, 4.0),
      (2L, 10L, 9.0)))
  }

  test("hotColdMerge carries no broadcast hint (AQE decides from runtime " +
    "size); small boundary still executes as a broadcast join") {
    val cold = Seq((1L, 10L, 1.0)).toDF("sid", "ts_ms", "value")
    val hot = Seq((1L, 20L, 2.5)).toDF("sid", "ts_ms", "value")
    val out = PointOps.hotColdMerge(cold, hot, Seq("sid"))
    // no static hint: at billions of concurrently-hot series a forced
    // broadcast of the boundary table would OOM the driver
    assert(!out.queryExecution.analyzed.toString.contains("ResolvedHint"),
      out.queryExecution.analyzed.toString)
    out.collect()
    // ...but AQE still broadcasts the aggregate-small boundary here
    assert(out.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
  }

  test("vector and/unless/or over series sets") {
    val l = Seq(1L, 2L, 3L).toDF("sid")
    val r = Seq(2L, 3L, 4L).toDF("sid")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.getLong(0)).toSet
    assert(ids(PointOps.vectorAnd(l, r, Seq("sid"))) === Set(2L, 3L))
    assert(ids(PointOps.vectorUnless(l, r, Seq("sid"))) === Set(1L))
    assert(ids(PointOps.vectorOr(l, r, Seq("sid"))) === Set(1L, 2L, 3L, 4L))
  }

  test("last-write-wins dedup keeps the highest-sequence sample") {
    val df = Seq((1L, 100L, 5.0, 1L), (1L, 100L, 7.0, 2L), (1L, 200L, 1.0, 3L))
      .toDF("sid", "ts_ms", "value", "seq")
    val out = PointOps.dedupLastWriteWins(df, Seq("sid", "ts_ms"), "seq")
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSet
    assert(out === Set((100L, 7.0), (200L, 1.0)))
  }

  test("asof join: inclusive ties, NULL before any right row, carry " +
    "across gaps, keys isolated, torn-proof struct payload") {
    import graft.tsdb.AsOfJoin
    val left = Seq(
      (1L, 1L, 5L, 0.5),   // before any right row → NULL payload
      (2L, 1L, 10L, 0.6),  // exactly at right ts 10 → inclusive match
      (3L, 1L, 25L, 0.7),  // between rights 20 and 30 → carries 20
      (4L, 1L, 99L, 0.8),  // far after the last right row → carries 30
      (5L, 2L, 50L, 0.9)   // other key: right history of key 1 invisible
    ).toDF("event_id", "k", "ts_ms", "value")
    // right row at ts 20 has a NULL in one payload field: the struct
    // carry must keep (20, null) together, never splice 10's price in
    val right = Seq(
      (1L, 10L, Some(100.0), "a"),
      (1L, 20L, None, "b"),
      (1L, 30L, Some(300.0), "c")
    ).toDF("k", "ts_ms", "price", "tag")
      .withColumn("r_ts", col("ts_ms"))
    val out = AsOfJoin.asof(left, right, "k", "ts_ms",
      Seq("r_ts", "price", "tag")).collect()
      .map(r => r.getLong(0) -> ((Option(r.get(4)), Option(r.get(5)),
        Option(r.get(6))))).toMap
    assert(out(1L) === ((None, None, None)))
    assert(out(2L) === ((Some(10L), Some(100.0), Some("a"))))
    assert(out(3L) === ((Some(20L), None, Some("b"))))
    assert(out(4L) === ((Some(30L), Some(300.0), Some("c"))))
    assert(out(5L) === ((None, None, None)))
  }

  test("asof join plans ONE hash shuffle and no join operator at all") {
    import graft.tsdb.AsOfJoin
    val left = Seq((1L, 1L, 10L)).toDF("event_id", "k", "ts_ms")
    val right = Seq((1L, 5L, 2.0)).toDF("k", "ts_ms", "price")
    val p = AsOfJoin.asof(left, right, "k", "ts_ms", Seq("price"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllMatchIn(p).length === 1, p)
    assert(!p.contains("Join"), p)
  }
}

/** withEvalSteps must enumerate exactly the eval steps whose trailing
  * window (eval-window, eval] contains the sample — checked against the
  * brute-force join over a messy grid/window combination.
  */
class EvalStepsSpec extends SparkSpec {
  import spark.implicits._

  test("exploded steps == brute-force window membership") {
    val start = 1000L; val end = 2000L; val step = 70L; val window = 150L
    val ts = (850L to 2100L by 13L)
    val pts = ts.map(t => (t, 1.0)).toDF("ts_ms", "value")
    val got = RangeWindows.withEvalSteps(pts, start, end, step, window)
      .select("ts_ms", "eval_ms").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val evals = (start to end by step)
    val want = (for { t <- ts; e <- evals if e >= t && e < t + window }
      yield (t, e)).toSet
    assert(got === want)
  }
}
