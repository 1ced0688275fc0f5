package graft.props

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Randomized properties for the round-8 operators:
  *
  * 1. Bitmap segments — for ANY generated (group, id) multiset under
  *    ANY partitioning, `bitmap64_count(bitmap64_agg(id))` equals the
  *    reference distinct count, and AND/OR cardinalities equal real
  *    set algebra on the per-group id sets.
  * 2. Containment vs Jaccard — over random near-dup corpora, every
  *    pair flagged by BOTH joins satisfies containment ≥ jaccard
  *    (min-denominator dominance), and a planted strict-prefix doc is
  *    flagged with containment exactly 1.0 against its source.
  */
class SegmentContainmentPropSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import graft.functions.BitmapFunctions._

  private def forAllSampled[T](g: Gen[T], n: Int)(body: T => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(4242L + i)).foreach(body)
    }

  test("bitmap segment cardinalities and set algebra match reference sets (randomized)") {
    val gen = for {
      n    <- Gen.chooseNum(1, 400)
      rows <- Gen.listOfN(n, for {
        g  <- Gen.oneOf("x", "y", "z")
        id <- Gen.chooseNum(-50L, 50L)
      } yield (g, id))
      parts <- Gen.chooseNum(1, 17)
    } yield (rows, parts)
    forAllSampled(gen, 12) { case (rows, parts) =>
      val df = rows.toDF("g", "id").repartition(parts)
      val got = df.groupBy($"g").agg(bitmap64_count(bitmap64_agg($"id")).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet.size.toLong).toMap
      assert(got === want, s"cardinalities for $parts partitions")
      // pairwise algebra over the present groups
      val sets = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val seg = df.groupBy($"g").agg(bitmap64_agg($"id").as("bm"))
      val pairs = seg.as("a").crossJoin(seg.as("b"))
        .select($"a.g".as("ga"), $"b.g".as("gb"),
          bitmap64_and_count($"a.bm", $"b.bm").as("i"),
          bitmap64_or_count($"a.bm", $"b.bm").as("u"))
        .collect()
      pairs.foreach { r =>
        val (sa, sb) = (sets(r.getString(0)), sets(r.getString(1)))
        assert(r.getLong(2) === (sa & sb).size.toLong)
        assert(r.getLong(3) === (sa | sb).size.toLong)
      }
    }
  }

  test("containment dominates jaccard; planted prefixes score exactly 1.0 (randomized)") {
    val word = Gen.chooseNum(0, 30).map(i => s"w$i")
    val gen = for {
      nDocs <- Gen.chooseNum(3, 12)
      docs  <- Gen.listOfN(nDocs, Gen.chooseNum(6, 30).flatMap(Gen.listOfN(_, word)))
    } yield docs
    forAllSampled(gen, 8) { docs =>
      val base = docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      // plant one strict prefix of doc 0 (first 5 words → ≥3 shingles)
      val planted = (1000L, docs.head.take(5).mkString(" "))
      val corpus = (base :+ planted).toDF("doc_id", "text")
      val cont = graft.ops.Dedup.ngramContainmentPairs(corpus, threshold = 0.0)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap
      val jac = graft.ops.Dedup.ngramJaccardPairs(corpus, threshold = 0.0)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      // same candidate pairs (same inverted index) and dominance
      assert(cont.keySet === jac.keySet)
      cont.foreach { case (k, c) =>
        assert(c >= jac(k) - 1e-12, s"pair $k: containment $c < jaccard ${jac(k)}")
        assert(c <= 1.0 + 1e-12)
      }
      // the planted prefix is fully contained in its source
      assert(cont.get((0L, 1000L)).exists(c => math.abs(c - 1.0) < 1e-12),
        s"prefix pair missing or not 1.0: ${cont.get((0L, 1000L))}")
    }
  }
}
