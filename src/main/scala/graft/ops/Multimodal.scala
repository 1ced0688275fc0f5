package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing for training-data pipelines (north
  * star): media as opaque `binary` columns with typed metadata, and a
  * decode/feature-extract stage shaped for distributed batch execution.
  *
  * IMAGE decode/resize/feature-extract is REAL: the JDK ships PNG/BMP/
  * JPEG codecs (`javax.imageio`, headless-safe), so [[ImageCodec]]
  * decodes actual pixels with no external library. Audio/video codecs
  * are NOT in this container; [[FakeCodec.decode]] remains the
  * explicitly marked deterministic STUB for those media types, and the
  * dispatch in [[extractFeatures]] shows exactly where a JavaCV-style
  * decoder would slot in.
  *
  * Scale notes: decode runs in `mapPartitions` so per-record codec
  * setup amortizes across a partition (the Scala analog of Python's
  * `mapInPandas` batch shape); repartition before decode balances
  * skewed media sizes; output is columnar-friendly (fixed-width
  * features), so downstream filters prune on metadata without touching
  * bytes.
  */
object Multimodal {

  // memory-cached ImageIO streams: the default disk cache creates and
  // deletes a temp FILE per encode/decode — pure filesystem overhead
  // when every payload is an in-memory byte array
  javax.imageio.ImageIO.setUseCache(false)

  /** Real image codec over the JDK's built-in `javax.imageio`
    * (PNG/BMP/JPEG readers/writers ship with every JVM; all paths here
    * are headless-safe). PNG is lossless, so decoded features are
    * bit-deterministic — the oracle for `m_image_decode` states them
    * in closed form.
    */
  object ImageCodec {
    import java.awt.image.BufferedImage

    def encodePng(width: Int, height: Int, rgbAt: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { img.setRGB(x, y, rgbAt(x, y)); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Decode → (width, height, meanLuma, aHash64); None if the bytes
      * are not a decodable image. meanLuma averages per-pixel integer
      * (r+g+b)/3 — exact integer sum, one double division, so
      * cross-engine reproducible. aHash64 is the standard 8×8
      * average-hash over a nearest-neighbor downsample (bit i set when
      * that cell's luma exceeds the 64-cell mean) — integer arithmetic
      * only, deterministic across JVMs.
      */
    def decode(bytes: Array[Byte]): Option[(Int, Int, Double, Long)] = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: java.io.IOException => null }
      Option(img).map { im =>
        val w = im.getWidth; val h = im.getHeight
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = im.getRGB(x, y)
            sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
            x += 1
          }
          y += 1
        }
        val mean = sum.toDouble / (w.toLong * h)
        // 8×8 average hash: nearest-neighbor grid sample, integer mean
        val cells = new Array[Int](64)
        var i = 0
        while (i < 64) {
          val rgb = im.getRGB(((i % 8) * w) / 8, ((i / 8) * h) / 8)
          cells(i) = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
          i += 1
        }
        val cellMean = cells.map(_.toLong).sum / 64
        var hash = 0L
        i = 0
        while (i < 64) { if (cells(i) > cellMean) hash |= (1L << i); i += 1 }
        (w, h, mean, hash)
      }
    }

    /** Exact nearest-neighbor resize (decode → sample → re-encode PNG).
      * Nearest-neighbor by integer index math — unlike Graphics2D
      * filters, every output pixel equals a specific input pixel, so
      * resizes are verifiable pixel-for-pixel.
      */
    def resizeNearest(bytes: Array[Byte], tw: Int, th: Int): Option[Array[Byte]] = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: java.io.IOException => null }
      Option(img).map { im =>
        val w = im.getWidth; val h = im.getHeight
        encodePng(tw, th, (x, y) => im.getRGB((x * w) / tw, (y * h) / th))
      }
    }
  }

  /** A media row: opaque bytes + source metadata. */
  final case class MediaRecord(doc_id: Long, media_type: String, media: Array[Byte])

  /** Extracted features (decode output). */
  final case class MediaFeatures(
      doc_id: Long, media_type: String, n_bytes: Int,
      width: Int, height: Int, brightness: Double, phash: Long)

  /** Real multi-frame codec over animated GIF — the one video-shaped
    * container the JDK reads AND writes natively (`javax.imageio`'s
    * GIF plugin handles frame sequences). Constant-palette frames
    * round-trip losslessly, so frame sampling is verifiable
    * pixel-for-pixel. Compressed video (h264 etc.) stays behind the
    * documented stub.
    */
  object VideoCodec {
    import java.awt.image.BufferedImage
    import javax.imageio.{IIOImage, ImageIO}

    /** Encode `frames` full frames of (width×height); `rgbAt(f, x, y)`
      * supplies each pixel.
      */
    def encodeGif(width: Int, height: Int, frames: Int,
                  rgbAt: (Int, Int, Int) => Int): Array[Byte] = {
      val w = ImageIO.getImageWritersByFormatName("gif").next()
      val bos = new java.io.ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(bos)
      try {
        w.setOutput(ios)
        w.prepareWriteSequence(null)
        var f = 0
        while (f < frames) {
          val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < height) {
            var x = 0
            while (x < width) { img.setRGB(x, y, rgbAt(f, x, y)); x += 1 }
            y += 1
          }
          w.writeToSequence(new IIOImage(img, null, null), null)
          f += 1
        }
        w.endWriteSequence()
      } finally { ios.close(); w.dispose() }
      bos.toByteArray
    }

    /** Every `everyNth` frame re-encoded as standalone PNG (so the
      * image pipeline applies downstream), with its frame index; None
      * if the bytes are not GIF. Frames are read raw (our writer emits
      * full frames; partial-frame disposal compositing of arbitrary
      * real-world GIFs is out of scope and documented).
      */
    def sampleFramesPng(bytes: Array[Byte], everyNth: Int): Option[Seq[(Int, Array[Byte])]] =
      try {
        val r = ImageIO.getImageReadersByFormatName("gif").next()
        val iis = ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(bytes))
        try {
          r.setInput(iis)
          val n = r.getNumImages(true)
          if (n <= 0) None
          else Some((0 until n by everyNth).map { f =>
            val raw = r.read(f)
            // palette-typed frame → canonical RGB before PNG encode
            val rgb = new BufferedImage(raw.getWidth, raw.getHeight,
              BufferedImage.TYPE_INT_RGB)
            val g = rgb.createGraphics()
            g.drawImage(raw, 0, 0, null)
            g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            ImageIO.write(rgb, "png", bos)
            (f, bos.toByteArray)
          })
        } finally { iis.close(); r.dispose() }
      } catch { case _: java.io.IOException => None
                case _: IndexOutOfBoundsException => None }
  }

  /** Real audio codec over the JDK's built-in `javax.sound.sampled`
    * (WAV/PCM read+write ships with every JVM; pure format code, no
    * audio device). PCM is lossless, so decoded signal statistics are
    * bit-deterministic — the `m_audio_decode` oracle states them in
    * closed form.
    */
  object AudioCodec {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

    /** Mono 16-bit little-endian PCM → WAV container bytes. The RIFF
      * header is written directly (44 fixed bytes) — routing the
      * encode through `AudioSystem.write` costs a provider-registry
      * lookup per call, which serializes a 32-thread batch encode; the
      * decode side stays on the real JDK codec.
      */
    def encodeWavPcm16(sampleRate: Float, samples: Array[Short]): Array[Byte] = {
      val dataLen = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val rate = sampleRate.toInt
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1) // PCM
        .putShort(1) // mono
        .putInt(rate)
        .putInt(rate * 2) // byte rate
        .putShort(2)      // block align
        .putShort(16)     // bits per sample
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      var i = 0
      while (i < samples.length) { bb.putShort(samples(i)); i += 1 }
      bb.array()
    }

    /** Decode → (sampleRate, nFrames, rms, meanAbs); None if the bytes
      * are not decodable 16-bit PCM audio. Sums are exact longs; rms is
      * sqrt of one exact-rounded double division, so a constant-
      * amplitude signal recovers its amplitude bit-exactly.
      */
    def decode(bytes: Array[Byte]): Option[(Int, Long, Double, Double)] =
      try {
        val ais = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16 ||
            fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED) None
        else {
          val data = ais.readAllBytes()
          val channels = fmt.getChannels
          val n = data.length / 2
          var sumSq = 0L; var sumAbs = 0L
          var i = 0
          while (i < n) {
            val v: Int =
              if (fmt.isBigEndian) ((data(2 * i) << 8) | (data(2 * i + 1) & 0xff)).toShort.toInt
              else ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort.toInt
            sumSq += v.toLong * v; sumAbs += math.abs(v).toLong
            i += 1
          }
          Some((fmt.getSampleRate.toInt, (n / channels).toLong,
            math.sqrt(sumSq.toDouble / n), sumAbs.toDouble / n))
        }
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => None
        case _: java.io.IOException => None
      }
  }

  /** Decoded audio signal statistics. */
  final case class AudioFeatures(
      doc_id: Long, sample_rate: Int, n_frames: Long, rms: Double, mean_abs: Double)

  /** WAV decode + signal statistics, batched per partition — the audio
    * face of [[extractFeatures]], real through [[AudioCodec]].
    */
  def extractAudioFeatures(spark: SparkSession, media: DataFrame): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { batch =>
      batch.map { r =>
        val (rate, frames, rms, meanAbs) = AudioCodec.decode(r.media).getOrElse(
          throw new IllegalArgumentException(
            s"undecodable ${r.media_type} payload for doc ${r.doc_id}"))
        AudioFeatures(r.doc_id, rate, frames, rms, meanAbs)
      }
    }
  }

  /** STUB codec — stands in for COMPRESSED audio (mp3/aac) and video
    * decoders (`???` in spirit: the container has no such codec libs;
    * images and WAV/PCM audio decode for real through [[ImageCodec]] /
    * [[AudioCodec]]). Deterministic in the input bytes so tests and
    * oracles are stable.
    */
  object FakeCodec {
    def decode(bytes: Array[Byte]): (Int, Int, Double, Long) = {
      // real impl would be e.g. a JavaCV FFmpegFrameGrabber
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

  /** media types [[ImageCodec]] decodes for real (JDK built-ins). */
  private val RealImageTypes = Set("image/png", "image/bmp", "image/jpeg")

  /** Decode + feature-extract, batched per partition. Real ImageIO
    * decode for JDK-supported image types; the deterministic stub for
    * everything else (audio/video — no codec libs in this container).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      decodeParallelism: Int = 0): Dataset[MediaFeatures] = {
    import spark.implicits._
    val sized = if (decodeParallelism > 0) media.repartition(decodeParallelism) else media
    sized.as[MediaRecord].mapPartitions { batch =>
      // per-partition codec init would go here (amortized, like mapInPandas)
      batch.map { r =>
        val (w, h, bright, ph) =
          if (RealImageTypes(r.media_type))
            ImageCodec.decode(r.media).getOrElse(
              throw new IllegalArgumentException(
                s"undecodable ${r.media_type} payload for doc ${r.doc_id}"))
          else FakeCodec.decode(r.media)
        MediaFeatures(r.doc_id, r.media_type, r.media.length, w, h, bright, ph)
      }
    }
  }

  /** A resized media row (decode → scale → re-encode shape). */
  final case class ResizedMedia(doc_id: Long, media_type: String,
                                width: Int, height: Int, media: Array[Byte])

  /** Resize stage: decode, scale to (targetW, targetH), re-encode.
    * Real nearest-neighbor resample through the decoded pixel buffer
    * for JDK-supported image types; deterministic byte-transform stub
    * for everything else (the binary→binary pipeline shape either way).
    */
  def resize(spark: SparkSession, media: DataFrame,
             targetW: Int, targetH: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { batch =>
      batch.map { r =>
        val out =
          if (RealImageTypes(r.media_type))
            ImageCodec.resizeNearest(r.media, targetW, targetH).getOrElse(
              throw new IllegalArgumentException(
                s"undecodable ${r.media_type} payload for doc ${r.doc_id}"))
          else {
            val scale = math.max(1, r.media.length / math.max(1, targetW * targetH))
            r.media.indices.by(scale).map(r.media).toArray
          }
        ResizedMedia(r.doc_id, r.media_type, targetW, targetH, out)
      }
    }
  }

  /** A sampled frame of a (fake) video payload. */
  final case class MediaFrame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Frame sampling: one row per sampled frame (row fan-out, the
    * video → every-Nth-frame stage). REAL GIF frame decode via
    * [[VideoCodec]] — each sampled frame comes out as standalone PNG
    * bytes, ready for the image pipeline; the byte-window STUB remains
    * for compressed-video media types (no codec libs offline).
    */
  def sampleFrames(spark: SparkSession, media: DataFrame,
                   frameBytes: Int = 64, everyNth: Int = 4): Dataset[MediaFrame] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { batch =>
      batch.flatMap { r =>
        if (r.media_type == "image/gif" || r.media_type == "video/gif")
          VideoCodec.sampleFramesPng(r.media, everyNth).getOrElse(
            throw new IllegalArgumentException(
              s"undecodable ${r.media_type} payload for doc ${r.doc_id}"))
            .iterator.map { case (f, png) => MediaFrame(r.doc_id, f, png) }
        else {
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
}
