package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing for training-data pipelines (north
  * star): media as opaque `binary` columns with typed metadata, and a
  * decode/feature-extract stage shaped for distributed batch execution.
  *
  * The actual codec libraries (image/audio/video) are NOT in this
  * container, so [[FakeCodec.decode]] is an explicitly marked STUB with
  * a deterministic fake; everything Spark-side — schema, typed Dataset
  * encoders, per-partition batch iteration, partition sizing — is real
  * and tested. Swapping the stub for JavaCV/javax.imageio is a
  * one-function change.
  *
  * Scale notes: decode runs in `mapPartitions` so per-record codec
  * setup amortizes across a partition (the Scala analog of Python's
  * `mapInPandas` batch shape); repartition before decode balances
  * skewed media sizes; output is columnar-friendly (fixed-width
  * features), so downstream filters prune on metadata without touching
  * bytes.
  */
object Multimodal {

  /** A media row: opaque bytes + source metadata. */
  final case class MediaRecord(doc_id: Long, media_type: String, media: Array[Byte])

  /** Extracted features (decode output). */
  final case class MediaFeatures(
      doc_id: Long, media_type: String, n_bytes: Int,
      width: Int, height: Int, brightness: Double, phash: Long)

  /** STUB codec — stands in for the real image/audio decoder (`???` in
    * spirit: the container has no codec libs). Deterministic in the
    * input bytes so tests and oracles are stable.
    */
  object FakeCodec {
    def decode(bytes: Array[Byte]): (Int, Int, Double, Long) = {
      // real impl would be e.g. ImageIO.read(new ByteArrayInputStream(bytes))
      val n = bytes.length
      var h = 1125899906842597L // deterministic FNV-ish roll
      var i = 0
      while (i < n) { h = h * 31 + (bytes(i) & 0xff); i += 1 }
      val width = 64 + (n % 64)
      val height = 64 + ((n / 7) % 64)
      val brightness = (math.abs(h % 1000L)).toDouble / 1000.0
      (width, height, brightness, h)
    }
  }

  /** Build a media table from the documents fixture: text bytes stand
    * in for encoded media (deterministic; every doc becomes one
    * "image").
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), lit("image/fake").as("media_type"),
      encode(col("text"), "UTF-8").as("media"))

  /** Decode + feature-extract, batched per partition. */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      decodeParallelism: Int = 0): Dataset[MediaFeatures] = {
    import spark.implicits._
    val sized = if (decodeParallelism > 0) media.repartition(decodeParallelism) else media
    sized.as[MediaRecord].mapPartitions { batch =>
      // per-partition codec init would go here (amortized, like mapInPandas)
      batch.map { r =>
        val (w, h, bright, ph) = FakeCodec.decode(r.media)
        MediaFeatures(r.doc_id, r.media_type, r.media.length, w, h, bright, ph)
      }
    }
  }

  /** A resized media row (decode → scale → re-encode shape). */
  final case class ResizedMedia(doc_id: Long, media_type: String,
                                width: Int, height: Int, media: Array[Byte])

  /** Resize stage: decode, scale to (targetW, targetH), re-encode.
    * STUB resampler — a real one would go through the decoded pixel
    * buffer; the stub keeps a deterministic byte transform so the
    * pipeline shape (binary→binary, metadata updated) is testable.
    */
  def resize(spark: SparkSession, media: DataFrame,
             targetW: Int, targetH: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { batch =>
      batch.map { r =>
        // real impl: decode → bilinear resample → encode
        val scale = math.max(1, r.media.length / math.max(1, targetW * targetH))
        val out = r.media.indices.by(scale).map(r.media).toArray
        ResizedMedia(r.doc_id, r.media_type, targetW, targetH, out)
      }
    }
  }

  /** A sampled frame of a (fake) video payload. */
  final case class MediaFrame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Frame sampling: one row per sampled frame (row fan-out, like a
    * video → every-Nth-frame stage). STUB frame splitter: fixed-size
    * byte windows stand in for decoded frames; the Spark shape
    * (flatMap fan-out, frame index, per-partition batching) is real.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame,
                   frameBytes: Int = 64, everyNth: Int = 4): Dataset[MediaFrame] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { batch =>
      batch.flatMap { r =>
        val nFrames = math.max(1, r.media.length / frameBytes)
        (0 until nFrames by everyNth).iterator.map { f =>
          val from = f * frameBytes
          val until = math.min(from + frameBytes, r.media.length)
          MediaFrame(r.doc_id, f, java.util.Arrays.copyOfRange(r.media, from, until))
        }
      }
    }
  }
}
