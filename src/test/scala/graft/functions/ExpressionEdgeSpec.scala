package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.HashFunctions._
import graft.functions.VectorFunctions._
import graft.functions.WinnowFunctions._

class ExpressionEdgeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("null and empty inputs are null-safe across all custom expressions") {
    val df = Seq(
      (1L, Some(Seq("a", "b", "c")), Some("hello world rolling hash")),
      (2L, Some(Seq.empty[String]), Some("")),
      (3L, None, None),
    ).toDF("id", "tokens", "text")
    val out = df.select($"id",
        minhash_sig($"tokens", 8).as("mh"),
        simhash64($"tokens").as("sh"),
        winnow_fingerprints($"text", 4, 3).as("wf"))
      .orderBy($"id").collect()
    // empty arrays → MaxValue sig / 0 simhash / empty fingerprints
    assert(out(1).getSeq[Long](1).forall(_ == Long.MaxValue))
    assert(out(1).getLong(2) === 0L)
    assert(out(1).getSeq[Long](3).isEmpty)
    // nulls → nulls (UnaryExpression null propagation)
    assert(out(2).isNullAt(1) && out(2).isNullAt(2) && out(2).isNullAt(3))
  }

  test("cosine_sim: mismatched dims use common prefix; zero vector gives 0") {
    val df = Seq(
      (Array(1.0f, 0.0f, 5.0f), Array(1.0f, 0.0f)),
      (Array(0.0f, 0.0f), Array(1.0f, 1.0f)),
    ).toDF("a", "b")
    val got = df.select(cosine_sim($"a", $"b")).as[Double].collect()
    // prefix semantics: dot, AND both norms, over min(len) dims ->
    // (1,0,5)x(1,0) restricted to 2 dims is (1,0)x(1,0) = exactly 1.0
    assert(got(0) === 1.0)
    assert(got(1) === 0.0)
  }

  test("shingle_hashes ≡ sorted distinct xxhash64(word_shingles) — byte-identical keys") {
    import graft.ops.TextOps
    import graft.functions.ShingleHashFunctions.shingle_hashes
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b c d e f", "one two", "single", "",
      "répé tition über straße 中文 分词 here",
      "dup dup dup dup dup dup", // repeated shingles → distinct set
    ).toDF("text")
    val rows = docs.select(
        shingle_hashes(TextOps.words($"text"), 3).as("direct"),
        sort_array(array_distinct(transform(
          TextOps.wordShingles($"text", 3), s => xxhash64(s)))).as("via_strings"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1), r.toString)
    }
    // null array ELEMENTS: both paths skip them identically (concatWs
    // semantics), no NPE
    val withNulls = Seq(Seq(Some("a"), None, Some("b"), Some("c")))
      .toDF("ws").select($"ws".cast("array<string>").as("ws"))
    val nr = withNulls.select(
        shingle_hashes($"ws", 3).as("direct"),
        sort_array(array_distinct(transform(
          graft.functions.ShingleFunctions.word_shingles($"ws", 3), s => xxhash64(s)))).as("via"))
      .head
    assert(nr.getSeq[Long](0) === nr.getSeq[Long](1))
  }

  test("minhash_sig_hashes: empty input gives MaxValue positions, nulls propagate") {
    import graft.functions.ShingleHashFunctions._
    val df = Seq(Some(Seq(1L, 2L, 3L)), Some(Seq.empty[Long]), None).toDF("hs")
    val out = df.select(minhash_sig_hashes($"hs", 8).as("sig")).collect()
    assert(out(0).getSeq[Long](0).length === 8)
    assert(out(1).getSeq[Long](0).forall(_ == Long.MaxValue))
    assert(out(2).isNullAt(0))
  }

  test("winnowing matches a plain-Scala reference implementation") {
    def reference(text: String, k: Int, w: Int): Seq[Long] = {
      val s = text.getBytes("UTF-8")
      if (s.length < k) return Nil
      val base = 1000003L
      val hs = (0 to s.length - k).map { i =>
        s.slice(i, i + k).foldLeft(0L)((h, b) => h * base + (b & 0xff))
      }
      if (hs.length <= w) {
        Seq(hs.zipWithIndex.minBy { case (h, i) => (h, -i) }._1)
      } else {
        hs.sliding(w).map(win => win.zipWithIndex.minBy { case (h, i) => (h, -i) }._1)
          .toSeq.distinct
      }
    }
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaa", // degenerate repeats
      "short",
      "one two three four five six seven eight nine ten")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val got = df.select($"id", winnow_fingerprints($"text", 8, 4).as("wf"))
      .as[(Long, Seq[Long])].collect().toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong).toSet === reference(t, 8, 4).toSet, s"text $i")
    }
  }

  test("winnowing guarantee: shared run >= w+k-1 chars -> shared fingerprint") {
    val shared = "this exact common substring is long enough to fingerprint"
    val a = s"prefix junk $shared more tail content here"
    val b = s"completely different opening $shared and another ending"
    val df = Seq((1L, a), (2L, b)).toDF("id", "text")
    val fps = df.select($"id", winnow_fingerprints($"text", 8, 4).as("wf"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(fps(1L).toSet.intersect(fps(2L).toSet).nonEmpty)
  }
}
