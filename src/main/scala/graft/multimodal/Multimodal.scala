package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media (image/audio/video) as opaque binary
  * columns with typed metadata, plus batch-shaped decode/feature-extract
  * stages.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly marked deterministic STUB ([[StubCodec.decode]]); everything
  * around it — schema, binary handling, partition-sized batching, frame
  * sampling — is real and tested. Swapping the stub for a JNI/OpenCV call
  * changes no plan shape.
  */
object Multimodal {

  /** Typed per-asset metadata extracted without decoding (real work —
    * sizes, digests, magic header) over a binary payload column.
    */
  def assetMetadata(docs: DataFrame): DataFrame = {
    val payload = encode(col("text"), "UTF-8") // stand-in binary asset
    docs.select(
      col("doc_id").as("asset_id"),
      octet_length(payload).as("n_bytes"),
      md5(payload).as("digest"),
      hex(substring(payload, 1, 4)).as("magic"))
  }

  /** Frame sampling: every `stride`-th fixed-size chunk of the payload, as
    * (asset_id, frame_idx, frame_digest) — the plan shape of video frame
    * extraction (posexplode of bounded slices; no driver loop).
    */
  def sampleFrames(docs: DataFrame, frameBytes: Int = 64, stride: Int = 4): DataFrame = {
    val payload = encode(col("text"), "UTF-8")
    docs
      .select(col("doc_id").as("asset_id"), payload.as("payload"))
      .select(col("asset_id"),
        posexplode(transform(
          sequence(lit(0),
            // Column `/` is double division; DIV keeps this integral
            greatest(expr(s"(octet_length(payload) - 1) DIV ${frameBytes * stride}")
              .cast("int"), lit(0))),
          i => col("payload").substr((i * frameBytes * stride + 1).cast("int"), lit(frameBytes)))))
      .select(col("asset_id"), col("pos").as("frame_idx"), md5(col("col")).as("frame_digest"))
  }

  final case class Asset(asset_id: Long, payload: Array[Byte])
  final case class Feature(asset_id: Long, width: Int, height: Int, meanLuma: Double)

  /** Batch decode/feature-extract. Partition-at-a-time (the Scala analogue
    * of `mapInPandas` batches): one codec instance per partition, rows
    * streamed through it. `StubCodec` is where a real decoder would live.
    */
  def decodeFeatures(assets: Dataset[Asset]): Dataset[Feature] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      val codec = StubCodec // per-partition init (real codecs are stateful)
      it.map { a =>
        val (w, h, luma) = codec.decode(a.payload)
        Feature(a.asset_id, w, h, luma)
      }
    }
  }

  /** STUB: deterministic fake decoder. A real implementation would parse
    * the container format here; the fake derives stable pseudo-features
    * from the payload bytes so tests are reproducible.
    */
  object StubCodec {
    def decode(payload: Array[Byte]): (Int, Int, Double) = {
      val n = payload.length
      val luma = if (n == 0) 0.0
      else payload.iterator.map(b => (b & 0xff).toDouble).sum / n / 255.0
      (16 + n % 64, 16 + (n / 64) % 64, luma)
    }
  }

  // --- REAL decoders for the two public uncompressed containers a
  // JVM can parse without native codecs: BMP (24bpp BITMAPINFOHEADER)
  // and WAV (RIFF 16-bit PCM). Compressed formats (JPEG/Opus/H.264)
  // still route to the documented stub — the point is that the
  // partition-at-a-time decode stage does REAL container parsing with
  // the same batch shape a JNI codec would use.

  final case class MediaFeature(
      asset_id: Long,
      kind: String, // "bmp" | "wav" | "opaque"
      width: Int, height: Int, // image dims (0 for audio)
      channels: Int, sampleRate: Int, // audio props (0 for image)
      durationMs: Double, // audio length (0 for image)
      meanLevel: Double) // mean luma (image) / RMS amplitude (audio)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    le16(b, i) | (le16(b, i + 2) << 16)

  /** 24bpp uncompressed BMP: BITMAPFILEHEADER + BITMAPINFOHEADER, rows
    * bottom-up and padded to 4 bytes, BGR order (the public format
    * layout). Mean level = mean Rec.601 luma over all pixels, in [0,1].
    */
  object BmpCodec {
    def matches(b: Array[Byte]): Boolean =
      b.length > 54 && b(0) == 'B'.toByte && b(1) == 'M'.toByte

    /** Assemble a 24bpp uncompressed BMP from a row-major (top-down)
      * (r, g, b) pixel function — the fixture builder for the decode
      * oracle; rows are stored bottom-up and padded per the format.
      */
    def encode(width: Int, height: Int,
        px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
      def w32(v: Int): Unit = { w16(v & 0xFFFF); w16(v >>> 16) }
      val rowBytes = ((width * 3 + 3) / 4) * 4
      val dataLen = rowBytes * height
      out.write('B'); out.write('M')
      w32(54 + dataLen); w32(0); w32(54)
      w32(40); w32(width); w32(height); w16(1); w16(24); w32(0)
      w32(dataLen); w32(2835); w32(2835); w32(0); w32(0)
      var y = height - 1 // bottom-up
      while (y >= 0) {
        var x = 0
        while (x < width) {
          val (r, g, b) = px(x, y)
          out.write(b & 0xFF); out.write(g & 0xFF); out.write(r & 0xFF)
          x += 1
        }
        var pad = rowBytes - width * 3
        while (pad > 0) { out.write(0); pad -= 1 }
        y -= 1
      }
      out.toByteArray
    }

    def decode(id: Long, b: Array[Byte]): MediaFeature = {
      val off = le32(b, 10)
      val width = le32(b, 18)
      val height = le32(b, 22)
      val bpp = le16(b, 28)
      require(bpp == 24 && le32(b, 30) == 0,
        s"only 24bpp uncompressed BMP supported (bpp=$bpp)")
      val rowBytes = ((width * 3 + 3) / 4) * 4
      var acc = 0.0
      var y = 0
      while (y < height) {
        var x = 0
        val base = off + y * rowBytes
        while (x < width) {
          val i = base + x * 3
          val luma = 0.114 * (b(i) & 0xFF) + 0.587 * (b(i + 1) & 0xFF) +
            0.299 * (b(i + 2) & 0xFF)
          acc += luma / 255.0
          x += 1
        }
        y += 1
      }
      val n = width.toLong * height
      MediaFeature(id, "bmp", width, height, 0, 0, 0.0,
        if (n == 0) 0.0 else acc / n)
    }
  }

  /** Perceptual difference-hash over decoded BMP pixels — the classic
    * image near-dup fingerprint (dHash: downscale to a (gw+1)×gh luma
    * grid, one bit per adjacent-column comparison). Everything is EXACT
    * integer arithmetic so the hash is bit-identical across engines and
    * partitionings: luma is the integer Rec.601 form
    * `299·R + 587·G + 114·B`, grid cells accumulate integer sums and
    * counts (cell of pixel x = `x·cols/width`, of STORAGE row s =
    * `s·gh/height` — BMP rows are stored bottom-up and the hash is
    * defined over storage order, mirrored exactly by the oracle), and
    * the mean comparison cross-multiplies at 128 bits ([[prodGt]]):
    * `sumA·cntB > sumB·cntA` — no division, no FP, no tie ambiguity,
    * no wrap at any image size. An empty cell (width < cols)
    * compares as 0-vs-0 → bit unset, deterministically.
    *
    * Near-dup semantics: small local edits move one cell's sum by a few
    * luma units and rarely cross a comparison margin, so re-encodes and
    * minor retouches collide; the downstream grouping is an exact
    * hash-agg — the image-side analogue of d1's digest dedup, with
    * [[graft.dedup.Dedup]]'s banding available above it when Hamming
    * tolerance is needed at scale. `mapPartitions` is justified as
    * binary container parsing, like [[decodeMedia]].
    */
  /** `a·b > c·d` over non-negative longs, exact at ANY magnitude: full
    * 128-bit product compare (`Math.multiplyHigh` high word + unsigned
    * low word). The naive 64-bit cross-multiply silently wraps once a
    * block holds ~1e5-1e6 high-amplitude 16-bit samples (a few minutes
    * of 44.1 kHz audio) or ~1e8-pixel grid cells — wrap flips the
    * comparison sign and breaks the bit-identical contract. The DuckDB
    * oracle side is already exact (its integer `sum()` is HUGEINT, so
    * its cross-multiply runs at 128 bits); this keeps the Scala side in
    * lockstep. Operands are non-negative (sums of squares / luma,
    * counts), so the signed high word IS the unsigned high word.
    */
  private def prodGt(a: Long, b: Long, c: Long, d: Long): Boolean = {
    val hi1 = Math.multiplyHigh(a, b)
    val hi2 = Math.multiplyHigh(c, d)
    if (hi1 != hi2) hi1 > hi2
    else java.lang.Long.compareUnsigned(a * b, c * d) > 0
  }

  def imageDHash(assets: Dataset[Asset], gw: Int = 8,
      gh: Int = 8): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions(_.map { a =>
      val b = a.payload
      require(BmpCodec.matches(b), "imageDHash expects BMP payloads")
      val off = le32(b, 10)
      val width = le32(b, 18)
      val height = le32(b, 22)
      require(le16(b, 28) == 24 && le32(b, 30) == 0,
        "only 24bpp uncompressed BMP supported")
      val rowBytes = ((width * 3 + 3) / 4) * 4
      val cols = gw + 1
      val sums = Array.ofDim[Long](cols * gh)
      val cnts = Array.ofDim[Long](cols * gh)
      var s = 0
      while (s < height) {
        val by = s * gh / height
        val base0 = off + s * rowBytes
        var x = 0
        while (x < width) {
          val i = base0 + x * 3
          val l = 114L * (b(i) & 0xFF) + 587L * (b(i + 1) & 0xFF) +
            299L * (b(i + 2) & 0xFF)
          val c = by * cols + x * cols / width
          sums(c) += l
          cnts(c) += 1
          x += 1
        }
        s += 1
      }
      var hash = 0L
      var by = 0
      while (by < gh) {
        var bx = 0
        while (bx < gw) {
          val i = by * cols + bx
          if (prodGt(sums(i), cnts(i + 1), sums(i + 1), cnts(i)))
            hash |= 1L << (by * gw + bx)
          bx += 1
        }
        by += 1
      }
      (a.asset_id, width, height, hash)
    }).toDF("asset_id", "width", "height", "dhash")
  }

  /** Per-asset EXACT integer luma total over decoded BMP pixels
    * (Σ 299·R + 587·G + 114·B — [[imageDHash]]'s Rec.601 integer form
    * without the grid): the media QUALITY statistic mm8's
    * keep-best-of-cluster retention ranks on. Integer end to end, so
    * the ordering is bit-identical across engines at any image size
    * (a float mean would reintroduce exactly the division this
    * family's 128-bit compares eliminated).
    */
  def imageLumaSum(assets: Dataset[Asset]): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions(_.map { a =>
      val b = a.payload
      require(BmpCodec.matches(b), "imageLumaSum expects BMP payloads")
      val off = le32(b, 10)
      val width = le32(b, 18)
      val height = le32(b, 22)
      require(le16(b, 28) == 24 && le32(b, 30) == 0,
        "only 24bpp uncompressed BMP supported")
      val rowBytes = ((width * 3 + 3) / 4) * 4
      var acc = 0L
      var s = 0
      while (s < height) {
        val base0 = off + s * rowBytes
        var x = 0
        while (x < width) {
          val i = base0 + x * 3
          acc += 114L * (b(i) & 0xFF) + 587L * (b(i + 1) & 0xFF) +
            299L * (b(i + 2) & 0xFF)
          x += 1
        }
        s += 1
      }
      (a.asset_id, acc)
    }).toDF("asset_id", "luma_sum")
  }

  /** RIFF/WAVE with a PCM `fmt ` chunk and 16-bit samples: channels,
    * rate and duration from the headers; mean level = RMS amplitude of
    * all samples normalized to [0,1].
    */
  object WavCodec {

    /** Assemble a 16-bit PCM WAV container (the export direction — and
      * the fixture builder for the decode oracle).
      */
    def encode(sampleRate: Int, samples: Seq[Int],
        channels: Int = 1): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
      def w32(v: Int): Unit = { w16(v & 0xFFFF); w16(v >>> 16) }
      def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
      val dataLen = samples.size * 2
      tag("RIFF"); w32(36 + dataLen); tag("WAVE")
      tag("fmt "); w32(16)
      w16(1); w16(channels); w32(sampleRate)
      w32(sampleRate * channels * 2); w16(channels * 2); w16(16)
      tag("data"); w32(dataLen)
      samples.foreach(w16)
      out.toByteArray
    }
    def matches(b: Array[Byte]): Boolean =
      b.length > 44 &&
        b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

    def decode(id: Long, b: Array[Byte]): MediaFeature = {
      var pos = 12
      var channels = 0
      var rate = 0
      var bits = 0
      var dataFrom = -1
      var dataLen = 0
      while (pos + 8 <= b.length) {
        val tag = new String(b, pos, 4, "US-ASCII")
        val len = le32(b, pos + 4)
        tag match {
          case "fmt " =>
            require(le16(b, pos + 8) == 1, "only PCM WAV supported")
            channels = le16(b, pos + 10)
            rate = le32(b, pos + 12)
            bits = le16(b, pos + 22)
          case "data" => dataFrom = pos + 8; dataLen = len
          case _ => ()
        }
        pos += 8 + len + (len & 1) // chunks are word-aligned
      }
      require(dataFrom >= 0 && bits == 16 && channels > 0 && rate > 0,
        "missing fmt/data chunk or non-16-bit samples")
      val nSamples = dataLen / 2
      var acc = 0.0
      var i = 0
      while (i < nSamples) {
        val s = le16(b, dataFrom + 2 * i).toShort.toDouble / 32768.0
        acc += s * s
        i += 1
      }
      val frames = nSamples / channels
      MediaFeature(id, "wav", 0, 0, channels, rate,
        frames.toDouble / rate * 1000.0,
        if (nSamples == 0) 0.0 else math.sqrt(acc / nSamples))
    }
  }

  /** Energy-contour fingerprint over decoded 16-bit PCM — the audio
    * sibling of [[imageDHash]] (the sign-of-energy-delta family behind
    * classic audio near-dup fingerprints, reduced to one band): the
    * sample stream splits into `blocks` time blocks (sample i → block
    * `i·blocks/n`), each accumulates the EXACT integer energy
    * `Σ s²` (Long — 16-bit samples cap a block's energy at 2³⁰·n, no
    * overflow below ~2⁵³ samples per block), and bit b is set iff
    * block b+1's mean energy exceeds block b's, compared
    * cross-multiplied at 128 bits ([[prodGt]] — the accumulators are
    * safe to 2⁵³ samples but their 64-bit PRODUCT wraps after only
    * ~1e5-1e6 high-amplitude samples per block) — no FP anywhere, so
    * the fingerprint is bit-identical across engines and
    * partitionings. Re-encodes and small local edits preserve the
    * energy contour; grouping is an exact hash-agg like mm5's.
    */
  def audioFingerprint(assets: Dataset[Asset],
      blocks: Int = 16): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions(_.map { a =>
      val b = a.payload
      require(WavCodec.matches(b), "audioFingerprint expects WAV payloads")
      var pos = 12
      var dataFrom = -1
      var dataLen = 0
      var rate = 0
      while (pos + 8 <= b.length) {
        val tag = new String(b, pos, 4, "US-ASCII")
        val len = le32(b, pos + 4)
        tag match {
          case "fmt " => rate = le32(b, pos + 12)
          case "data" => dataFrom = pos + 8; dataLen = len
          case _ => ()
        }
        pos += 8 + len + (len & 1)
      }
      require(dataFrom >= 0, "missing data chunk")
      val n = dataLen / 2
      val sums = Array.ofDim[Long](blocks)
      val cnts = Array.ofDim[Long](blocks)
      var i = 0
      while (i < n) {
        val s = le16(b, dataFrom + 2 * i).toShort.toLong
        val blk = (i.toLong * blocks / n).toInt
        sums(blk) += s * s
        cnts(blk) += 1
        i += 1
      }
      var fp = 0L
      var blk = 0
      while (blk < blocks - 1) {
        if (prodGt(sums(blk + 1), cnts(blk), sums(blk), cnts(blk + 1)))
          fp |= 1L << blk
        blk += 1
      }
      (a.asset_id, n.toLong, rate, fp)
    }).toDF("asset_id", "n_samples", "sample_rate", "fingerprint")
  }

  /** Banded-Hamming near-duplicate pairs over 64-bit perceptual
    * fingerprints ([[imageDHash]] / [[audioFingerprint]] outputs) — the
    * Hamming-tolerant grouping those scaladocs promise, same discipline
    * as [[graft.dedup.Dedup]]'s MinHash banding: split each hash into
    * `bands` equal bit-bands, candidate two assets on ANY band equality
    * (pigeonhole: a pair within Hamming distance < `bands` must agree
    * on at least one band — `bands > maxHamming` makes recall EXACTLY 1,
    * not probabilistic), then verify candidates by 64-bit popcount of
    * the XOR. Exact dups (distance 0) and near-dups pass together.
    *
    * Scale shape: one projection computes the band values (arithmetic
    * shift + mask — engine-agnostic: masking keeps only bits below the
    * band width, so sign extension cannot leak in), one equi-join on
    * (band, value) builds candidates — at 64 bits and bands=4, a
    * 16-bit band space keeps collision groups near-singleton for any
    * well-spread perceptual hash, so candidates ≈ true pairs + O(n²/2¹⁶)
    * noise — and the popcount verify touches candidates only. No
    * all-pairs stage anywhere.
    */
  def hammingNearDupPairs(hashes: DataFrame, idCol: String,
      hashCol: String, bands: Int = 4, maxHamming: Int = 3): DataFrame = {
    require(bands > maxHamming && 64 % bands == 0,
      "recall-1 guarantee needs bands > maxHamming and bands | 64")
    val bits = 64 / bands
    val mask = (1L << bits) - 1
    val banded = hashes.select(col(idCol), col(hashCol))
      .withColumn("__bvs", array((0 until bands).map(b =>
        shiftrightunsigned(col(hashCol), b * bits)
          .bitwiseAND(lit(mask))): _*))
      .select(col(idCol), col(hashCol),
        posexplode(col("__bvs")).as(Seq("band", "bv")))
    val a = banded.select(col("band"), col("bv"),
      col(idCol).as("id_a"), col(hashCol).as("h_a"))
    val b = banded.select(col("band"), col("bv"),
      col(idCol).as("id_b"), col(hashCol).as("h_b"))
    a.join(b, Seq("band", "bv"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "h_a", "h_b").distinct()
      .withColumn("hamming",
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).cast("long"))
      .where(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Partition-at-a-time media decode routing by container magic — BMP
    * and WAV are parsed FOR REAL; anything else gets the documented
    * stub features under kind "opaque". Same `mapInPandas`-style batch
    * shape as [[decodeFeatures]].
    */
  def decodeMedia(assets: Dataset[Asset]): Dataset[MediaFeature] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        if (BmpCodec.matches(a.payload)) BmpCodec.decode(a.asset_id, a.payload)
        else if (WavCodec.matches(a.payload)) WavCodec.decode(a.asset_id, a.payload)
        else {
          val (w, h, l) = StubCodec.decode(a.payload)
          MediaFeature(a.asset_id, "opaque", w, h, 0, 0, 0.0, l)
        }
      }
    }
  }
}
