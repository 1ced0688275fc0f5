package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.Tables

class IvfSkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("IVF: planted exact duplicates found at rank 1 (same cell, sim 1)") {
    val emb = Tables(spark, dir).embeddings
    val offset = 1000000L
    val corpus = emb.unionByName(emb.withColumn("vec_id", $"vec_id" + offset))
    val probes = emb.limit(10)
    val top1 = IvfAnn.annTopK(corpus, probes, k = 1, nlist = 16, nprobe = 4)
      .select($"probe_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    probes.select($"vec_id").as[Long].collect().foreach { p =>
      assert(top1(p) === p + offset, s"probe $p")
    }
  }

  test("IVF cell assignment covers the corpus exactly once") {
    val emb = Tables(spark, dir).embeddings
    val cents = IvfAnn.centroids(emb, nlist = 8)
    assert(cents.count() === 8)
    val assigned = IvfAnn.assign(emb, cents)
    assert(assigned.count() === emb.count())
    assert(assigned.select("vec_id").distinct().count() === emb.count())
    assert(assigned.agg(countDistinct($"centroid_id")).head.getLong(0) <= 8)
  }

  test("kmeans refinement improves mean assignment similarity, keeps recall") {
    import graft.functions.VectorFunctions.centroid_argmax
    val emb = Tables(spark, dir).embeddings
    def meanSim(cents: Seq[Array[Float]]): Double = {
      val centsDf = cents.zipWithIndex
        .map { case (v, i) => (i, v.toSeq) }.toDF("cid", "cv")
      emb.select($"embedding".cast("array<float>").as("_v"))
        .withColumn("cell", centroid_argmax($"_v", cents))
        .join(broadcast(centsDf), $"cell" === $"cid")
        .select(graft.functions.VectorFunctions.cosine_sim($"_v", $"cv").as("s"))
        .agg(avg($"s")).head.getDouble(0)
    }
    val init = IvfAnn.centroidArray(emb, nlist = 8)
    val refined = IvfAnn.refineCentroids(emb, init, iters = 3)
    assert(refined.size === init.size)
    val (s0, s1) = (meanSim(init), meanSim(refined))
    assert(s1 > s0, s"refinement should tighten cells: $s0 -> $s1")
    // planted-dup recall still 1.0 through the refined index
    val offset = 1000000L
    val corpus = emb.unionByName(emb.withColumn("vec_id", $"vec_id" + offset))
    val probes = emb.limit(5)
    val top1 = IvfAnn.annTopK(corpus, probes, k = 1, nlist = 8, nprobe = 3,
        refineIters = 2)
      .select($"probe_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    probes.select($"vec_id").as[Long].collect().foreach { p =>
      assert(top1(p) === p + offset, s"probe $p")
    }
  }

  test("annTopK shuffle-join path (broadcastProbes=false) matches the broadcast path") {
    val emb = Tables(spark, dir).embeddings
    val offset = 1000000L
    val corpus = emb.unionByName(emb.withColumn("vec_id", $"vec_id" + offset))
    val probes = emb.limit(8)
    def run(bcast: Boolean) =
      Similarity.annTopK(corpus, probes, k = 3, dim = 64, broadcastProbes = bcast)
        .select($"probe_id", $"rank", $"neighbor_id").as[(Long, Int, Long)]
        .collect().toSet
    assert(run(false) === run(true))
  }

  test("salted join equals plain join on skewed data") {
    // hot key: 90% of left rows share key 1
    val left = ((1 to 900).map(i => (1L, i)) ++ (1 to 100).map(i => (i.toLong % 7 + 2, i)))
      .toDF("k", "payload")
    val right = (1 to 10).map(i => (i.toLong, s"dim_$i")).toDF("k", "name")
    val plain = left.join(right, "k").select($"k", $"payload", $"name")
      .as[(Long, Int, String)].collect().toSet
    val salted = SkewJoin.saltedInnerJoin(left, right, "k", buckets = 8)
      .select($"k", $"payload", $"name")
      .as[(Long, Int, String)].collect().toSet
    assert(salted === plain)
    assert(salted.nonEmpty)
  }

  test("multimodal resize and frame sampling shapes") {
    val media = Multimodal.mediaFromDocuments(Tables(spark, dir).documents.limit(20))
    val resized = Multimodal.resize(spark, media, 32, 32).collect()
    assert(resized.length === 20)
    resized.foreach { r => assert(r.width === 32 && r.height === 32 && r.media.nonEmpty) }
    val frames = Multimodal.sampleFrames(spark, media, frameBytes = 50, everyNth = 2)
    val byDoc = frames.collect().groupBy(_.doc_id)
    assert(byDoc.size === 20)
    byDoc.values.foreach { fs =>
      assert(fs.map(_.frame_idx).distinct.length === fs.length) // unique frame indices
      assert(fs.forall(f => f.frame_idx % 2 === 0))             // every-2nd sampling
    }
  }
}
