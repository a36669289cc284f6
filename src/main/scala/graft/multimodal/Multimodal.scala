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
}
