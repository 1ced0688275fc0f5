package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.Tables

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("binary plumbing: schema, determinism, feature ranges") {
    val media = Multimodal.mediaFromDocuments(Tables(spark, dir).documents)
    assert(media.schema("media").dataType.typeName === "binary")
    val feats = Multimodal.extractFeatures(spark, media)
    val rows = feats.collect()
    assert(rows.length === media.count())
    rows.foreach { f =>
      assert(f.width >= 64 && f.width < 128)
      assert(f.height >= 64 && f.height < 128)
      assert(f.brightness >= 0.0 && f.brightness <= 1.0)
      assert(f.n_bytes > 0)
    }
    // deterministic: same input → same features (stub codec is pure)
    val again = Multimodal.extractFeatures(spark, media).collect()
    assert(again.map(f => (f.doc_id, f.phash)).toSet ===
           rows.map(f => (f.doc_id, f.phash)).toSet)
  }

  test("decode parallelism repartitions without changing results") {
    val media = Multimodal.mediaFromDocuments(Tables(spark, dir).documents)
    val a = Multimodal.extractFeatures(spark, media).collect().map(_.doc_id).sorted
    val b = Multimodal.extractFeatures(spark, media, decodeParallelism = 7)
      .collect().map(_.doc_id).sorted
    assert(a === b)
  }

  test("real PNG roundtrip: encode → decode recovers exact dimensions and pixels") {
    import Multimodal.ImageCodec
    // 20×10 gradient; PNG is lossless so every pixel must round-trip
    val rgbAt = (x: Int, y: Int) => ((x * 12) << 16) | ((y * 25) << 8) | 77
    val png = ImageCodec.encodePng(20, 10, rgbAt)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth === 20 && img.getHeight === 10)
    for (y <- 0 until 10; x <- 0 until 20)
      assert((img.getRGB(x, y) & 0xffffff) === rgbAt(x, y))
    val Some((w, h, mean, _)) = ImageCodec.decode(png)
    assert(w === 20 && h === 10)
    // mean of per-pixel (r+g+b)/3 over the closed-form gradient
    val want = (for (y <- 0 until 10; x <- 0 until 20)
      yield ((x * 12) + (y * 25) + 77) / 3).map(_.toLong).sum.toDouble / 200
    assert(mean === want)
  }

  test("real decode dispatches by media type; phash separates distinct images") {
    import Multimodal.{ImageCodec, MediaRecord}
    val dark = ImageCodec.encodePng(16, 16, (x, _) => if (x < 8) 0 else 0xffffff)
    val light = ImageCodec.encodePng(16, 16, (_, y) => if (y < 8) 0xffffff else 0)
    val media = Seq(
      MediaRecord(1L, "image/png", dark),
      MediaRecord(2L, "image/png", light),
      MediaRecord(3L, "image/png", dark)).toDF()
    val feats = Multimodal.extractFeatures(spark, media).collect().sortBy(_.doc_id)
    assert(feats.map(f => (f.width, f.height)).toSeq === Seq((16, 16), (16, 16), (16, 16)))
    assert(feats(0).phash === feats(2).phash) // identical images, identical hash
    assert(feats(0).phash !== feats(1).phash) // different layout, different hash
    assert(feats(0).brightness === 127.5)     // half black, half (255,255,255)
  }

  test("nearest-neighbor resize is pixel-exact against the index map") {
    import Multimodal.{ImageCodec, MediaRecord}
    val rgbAt = (x: Int, y: Int) => ((x * 7 + y * 13) % 251) * 0x010101
    val src = ImageCodec.encodePng(32, 16, rgbAt)
    val out = Multimodal.resize(spark,
        Seq(MediaRecord(9L, "image/png", src)).toDF(), 8, 8)
      .collect().head
    assert(out.width === 8 && out.height === 8)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out.media))
    assert(img.getWidth === 8 && img.getHeight === 8)
    for (y <- 0 until 8; x <- 0 until 8)
      assert((img.getRGB(x, y) & 0xffffff) === rgbAt((x * 32) / 8, (y * 16) / 8))
  }

  test("real WAV roundtrip: PCM16 encode → decode recovers frames and exact signal stats") {
    import Multimodal.{AudioCodec, MediaRecord}
    // ±700 square wave, 240 frames at 16 kHz
    val samples = Array.tabulate(240)(i => if (i % 2 == 0) 700.toShort else (-700).toShort)
    val wav = AudioCodec.encodeWavPcm16(16000f, samples)
    val Some((rate, frames, rms, meanAbs)) = AudioCodec.decode(wav)
    assert(rate === 16000 && frames === 240L)
    assert(rms === 700.0 && meanAbs === 700.0)
    // through the distributed face
    val feats = Multimodal.extractAudioFeatures(spark,
      Seq(MediaRecord(5L, "audio/wav", wav)).toDF()).collect().head
    assert(feats.n_frames === 240L && feats.rms === 700.0)
    // junk is refused, not faked
    assert(AudioCodec.decode(Array[Byte](9, 9, 9)).isEmpty)
  }

  test("real GIF frame sampling: every Nth frame round-trips pixel-exact as PNG") {
    import Multimodal.{ImageCodec, MediaRecord, VideoCodec}
    // 7 frames, frame f constant gray 30*f + 5
    val gif = VideoCodec.encodeGif(12, 6, 7, (f, _, _) => {
      val g = 30 * f + 5; (g << 16) | (g << 8) | g
    })
    val frames = Multimodal.sampleFrames(spark,
        Seq(MediaRecord(3L, "video/gif", gif)).toDF(), everyNth = 2)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq === Seq(0, 2, 4, 6))
    frames.foreach { fr =>
      val Some((w, h, mean, _)) = ImageCodec.decode(fr.frame)
      assert(w === 12 && h === 6)
      assert(mean === (30 * fr.frame_idx + 5).toDouble) // constant frame: exact
    }
  }

  test("undecodable bytes under a real image type fail loud, not silently fake") {
    import Multimodal.MediaRecord
    val junk = Seq(MediaRecord(1L, "image/png", Array[Byte](1, 2, 3))).toDF()
    val e = intercept[org.apache.spark.SparkException](
      Multimodal.extractFeatures(spark, junk).collect())
    assert(e.getMessage != null)
  }
}
