package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** N-gram containment join: the asymmetric criterion must flag a
  * prefix-subset pair that Jaccard (at the same floor) misses, and
  * must stay quiet on unrelated text.
  */
class ContainmentSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("containment flags subset pairs invisible to jaccard; unrelated stay apart") {
    import spark.implicits._
    val full = (1 to 12).map(i => s"w$i").mkString(" ") // 10 trigrams
    val half = (1 to 5).map(i => s"w$i").mkString(" ")  // 3 trigrams, all ⊆ full
    val other = (1 to 12).map(i => s"z$i").mkString(" ")
    val docs = Seq((1L, full), (2L, half), (3L, other)).toDF("doc_id", "text")

    val cont = Dedup.ngramContainmentPairs(docs, threshold = 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getInt(2), r.getInt(3), r.getDouble(4)))
      .toMap
    assert(cont.keySet === Set((1L, 2L)), s"pairs ${cont.keySet}")
    val (aSz, bSz, c) = cont((1L, 2L))
    assert(aSz === 10 && bSz === 3)
    assert(c === 1.0) // all 3 of the prefix's trigrams appear in full

    // the same pair's jaccard is 3/10 — far below the 0.8 floor
    val jac = Dedup.ngramJaccardPairs(docs, threshold = 0.8).collect()
    assert(jac.isEmpty, s"jaccard unexpectedly flagged ${jac.toSeq}")
  }

  test("symmetric near-identical pairs are found by both criteria") {
    import spark.implicits._
    val a = (1 to 20).map(i => s"t$i").mkString(" ")
    val b = (1 to 19).map(i => s"t$i").mkString(" ") // drop last word
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val cont = Dedup.ngramContainmentPairs(docs, threshold = 0.8).collect()
    val jac = Dedup.ngramJaccardPairs(docs, threshold = 0.8).collect()
    assert(cont.length === 1 && jac.length === 1)
    assert(cont.head.getDouble(4) === 1.0)      // b ⊂ a exactly
    assert(jac.head.getDouble(2) > 0.9)
  }
}
