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
}
