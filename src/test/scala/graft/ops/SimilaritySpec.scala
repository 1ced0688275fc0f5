package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.Tables

/** The approximate operators are validated against exact baselines:
  * brute-force cosine against a plain-Scala computation, MinHash-LSH
  * against the exact inverted-index Jaccard join, ANN against planted
  * exact duplicates.
  */
class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("bruteTopK matches a plain-Scala exact computation") {
    val emb = Tables(spark, dir).embeddings
    val all = emb.select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < math.min(a.length, b.length)) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1
      }
      if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val probes = all.filter(_._1 < 3)
    val expected = probes.map { case (pid, pv) =>
      pid -> all.filter(_._1 != pid)
        .map { case (nid, nv) => (nid, cos(pv, nv)) }
        .sortBy { case (nid, s) => (-s, nid) }.take(5).map(_._1).toSeq
    }.toMap

    val got = Similarity.bruteTopK(emb, emb.filter($"vec_id" < 3), k = 5)
      .orderBy($"probe_id", $"rank")
      .select($"probe_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).toSeq }
    assert(got === expected)
  }

  test("minhash-LSH pairs equal exact ngram-jaccard pairs on the fixture") {
    val docs = Tables(spark, dir).documents
    val exact = Dedup.ngramJaccardPairs(docs, threshold = 0.5)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minHashLshPairs(docs, threshold = 0.5)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)     // fixture plants near-dups
    assert(lsh === exact)      // no false positives (verified), no misses at these sims
  }

  test("ANN finds every planted exact duplicate at rank 1") {
    val emb = Tables(spark, dir).embeddings
    val offset = 1000000L
    val corpus = emb.unionByName(emb.withColumn("vec_id", $"vec_id" + offset))
    val probes = emb.limit(20)
    val top1 = Similarity.annTopK(corpus, probes, k = 1, dim = 64)
      .select($"probe_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    val probeIds = probes.select($"vec_id").as[Long].collect()
    probeIds.foreach { p => assert(top1(p) === p + offset, s"probe $p") }
  }

  test("simhash banding finds exactly the brute-force Hamming<=3 pairs") {
    val docs = Tables(spark, dir).documents
    val pairs = Dedup.simHashPairs(docs, maxHamming = 3)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    // brute-force oracle over the same fingerprints
    val fps = docs.select($"doc_id",
        graft.functions.HashFunctions.simhash64(TextOps.words($"text")).as("sh"))
      .as[(Long, Long)].collect()
    val brute = (for {
      (a, ha) <- fps; (b, hb) <- fps if a < b
      if java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b)).toSet
    assert(pairs === brute) // pigeonhole: d<=3 over 4 chunks must share one
    // identical token multisets → distance 0 → always found
    val twin = docs.limit(3).unionByName(
      docs.limit(3).withColumn("doc_id", $"doc_id" + 5000L))
    val twinPairs = Dedup.simHashPairs(twin, maxHamming = 0)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(Set((0L, 5000L), (1L, 5001L), (2L, 5002L)).subsetOf(twinPairs))
  }

  test("dedupByClusters keeps exactly one doc per near-dup component") {
    val docs = Tables(spark, dir).documents
    val pairs = Dedup.ngramJaccardPairs(docs, threshold = 0.5)
    val clusters = Dedup.nearDupClusters(pairs)
      .as[(Long, Long)].collect()
    assert(clusters.nonEmpty)
    // every root is the min of its component
    clusters.groupBy(_._2).foreach { case (root, members) =>
      assert(members.map(_._1).min === root)
    }
    val kept = Dedup.dedupByClusters(docs, pairs)
    val dropped = clusters.count { case (id, root) => id != root }
    assert(kept.count() === docs.count() - dropped)
    // idempotent: rerunning on the deduped corpus drops nothing more
    val pairs2 = Dedup.ngramJaccardPairs(kept, threshold = 0.5)
    assert(Dedup.dedupByClusters(kept, pairs2).count() === kept.count())
  }

  test("star-contraction connected components match a union-find oracle") {
    def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      nodes.map(x => x -> find(x)).toMap
    }
    // adversarial shapes: long chains (O(diameter) killers), stars,
    // cycles, cliques, singleton edges, plus seeded random graphs
    val shapes: Seq[Seq[(Long, Long)]] = Seq(
      (0L until 40L).map(i => (i, i + 1)),                       // chain
      (1L to 20L).map(i => (0L, i)),                             // star at min
      (0L until 20L).map(i => (i, 20L)),                         // star at max
      (0L until 15L).map(i => (i, (i + 1) % 15)),                // cycle
      (for (i <- 0L until 8L; j <- i + 1 until 8L) yield (i, j)), // clique
      Seq((5L, 6L), (100L, 200L), (7L, 5L)),                     // tiny forests
    ) ++ (0 until 6).map { s =>
      val r = new scala.util.Random(1234 + s)
      (0 until 60).map(_ => (r.nextInt(40).toLong, r.nextInt(40).toLong))
        .filter(e => e._1 != e._2)
    }
    shapes.zipWithIndex.foreach { case (edges, i) =>
      val pairs = edges.toDF("a_id", "b_id")
      val got = Dedup.nearDupClusters(pairs).as[(Long, Long)].collect().toMap
      val want = unionFind(0, edges)
      assert(got === want, s"shape $i: got $got want $want")
    }
  }

  test("cosineDupPairs recall 1.0 on planted duplicates") {
    val emb = Tables(spark, dir).embeddings
    val offset = 1000000L
    val corpus = emb.unionByName(emb.withColumn("vec_id", $"vec_id" + offset))
    val got = Similarity.cosineDupPairs(corpus, threshold = 0.99, dim = 64)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    val want = emb.select($"vec_id").as[Long].collect()
      .map(i => (i, i + offset)).toSet
    assert(got === want)
  }

  test("semDeDupPairs equals the within-cell exact baseline and finds all planted dups") {
    val emb = Tables(spark, dir).embeddings
    val offset = 1000000L
    val corpus = emb.unionByName(emb.withColumn("vec_id", $"vec_id" + offset))
    val nlist = 16
    val got = Similarity.semDeDupPairs(corpus, threshold = 0.99, nlist = nlist,
        refineIters = 2)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet

    // identical vectors always share a cell, so planted pairs are exact recall
    val planted = emb.select($"vec_id").as[Long].collect()
      .map(i => (i, i + offset)).toSet
    assert(got === planted)

    // ground truth: recompute the SAME deterministic centroids, assign,
    // and brute-force pairs within each cell — semDeDupPairs must match
    // the published algorithm exactly, not just hit the planted set
    val cents = IvfAnn.refineCentroids(corpus,
      IvfAnn.centroidArray(corpus, nlist), iters = 2)
    val assigned = IvfAnn.assign(corpus, IvfAnn.centroidsDf(spark, cents))
      .select($"vec_id", $"centroid_id", $"embedding")
      .as[(Long, Int, Array[Float])].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = assigned.groupBy(_._2).values.flatMap { cellArr =>
      val cell = cellArr.toSeq
      for {
        a <- cell; b <- cell
        if a._1 < b._1 && cos(a._3, b._3) >= 0.99
      } yield (a._1, b._1)
    }.toSet
    assert(got === expected)
  }
}
