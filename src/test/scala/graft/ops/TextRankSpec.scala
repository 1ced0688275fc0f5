package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** TextRank's load-bearing claim is EXACTNESS, not approximation: the
  * scaled-integer iteration must give bit-identical ranks regardless
  * of partitioning (integer sums are order-independent; the DuckDB
  * oracle replays the same arithmetic). The graph semantics are
  * pinned on a hand-checkable chain.
  */
class TextRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("chain graph: the hub outranks the leaves, which tie exactly") {
    // x—y—z: y has two neighbors, x and z one each (symmetric weights)
    val docs = Seq("x y", "y z").toDF("text")
    val r = TextRank.keywords(docs).collect()
      .map(row => (row.getString(0), row.getDouble(1)))
    assert(r.map(_._1).toSeq == Seq("y", "x", "z")) // rank desc, term tiebreak
    assert(r(1)._2 == r(2)._2, "symmetric leaves must tie to the last bit")
    assert(r(0)._2 > r(1)._2)
  }

  test("one-iteration ranks match the closed-form integer arithmetic") {
    // after one iteration from r0 = S: leaves get 0.15S + (85*S) div 200,
    // the hub gets 0.15S + 2 * ((85*S) div 100)
    val docs = Seq("x y", "y z").toDF("text")
    val r = TextRank.keywords(docs, iterations = 1).collect()
      .map(row => (row.getString(0), row.getDouble(1))).toMap
    val s = 1000000000000L
    val leaf = 150000000000L + (85L * s) / 200
    val hub = 150000000000L + 2 * ((85L * s) / 100)
    assert(r("x") == math.rint(leaf / 1e12 * 1e6) / 1e6)
    assert(r("y") == math.rint(hub / 1e12 * 1e6) / 1e6)
  }

  test("partitioning does not change a single score; topK limits") {
    val words = ('a' to 'k').map(_.toString)
    val docs = (0 until 40).map { i =>
      // deterministic pseudo-random word chains, fixed seed
      val rnd = new scala.util.Random(i * 7919)
      (0 until 12).map(_ => words(rnd.nextInt(words.size))).mkString(" ")
    }.toDF("text")
    val base = TextRank.keywords(docs, topK = 8).collect()
      .map(row => (row.getString(0), row.getDouble(1))).toSeq
    val repart = TextRank.keywords(docs.repartition(13), topK = 8).collect()
      .map(row => (row.getString(0), row.getDouble(1))).toSeq
    assert(base == repart, "scaled-integer ranks must be partitioning-invariant")
    assert(base.size == 8)
  }
}
