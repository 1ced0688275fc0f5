package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** BM25 retrieval and unigram-LM scoring against a hand-computed
  * oracle on a tiny controlled corpus (independent scalar-math
  * re-derivation in the test — not a Spark-vs-Spark tautology), plus
  * the plan shapes that make them scale: the query-term filter must
  * reach the exploded scan, and top-k must be TakeOrderedAndProject.
  */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val corpusDir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("retrieval").toString
    Seq(
      (1L, "spark join spark", "en", "web", 16L),
      (2L, "join window table", "en", "web", 17L),
      (3L, "data table row", "en", "book", 14L),
      (4L, "spark spark spark spark", "en", "code", 23L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private def bm25Ref(tfs: Map[Long, Map[String, Int]], dls: Map[Long, Int]): Map[Long, Double] = {
    val n = dls.size.toDouble
    val avgdl = dls.values.sum.toDouble / n
    val terms = Seq("spark", "join", "window")
    val df = terms.map(t => t -> tfs.count(_._2.contains(t)).toDouble).toMap
    tfs.map { case (doc, tf) =>
      val s = terms.collect {
        case t if tf.contains(t) =>
          val idf = math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))
          val f = tf(t).toDouble
          idf * f * 2.2 / (f + 1.2 * (1 - 0.75 + 0.75 * dls(doc) / avgdl))
      }.sum
      doc -> BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.filter(_._2 > 0.0)
  }

  test("bm25 matches a scalar re-derivation on a controlled corpus") {
    val got = TextQueries.bm25TopK(spark, corpusDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val tfs = Map(
      1L -> Map("spark" -> 2, "join" -> 1),
      2L -> Map("join" -> 1, "window" -> 1),
      4L -> Map("spark" -> 4))
    val dls = Map(1L -> 3, 2L -> 3, 3L -> 3, 4L -> 4)
    val want = bm25Ref(tfs, dls)
    assert(got.keySet == want.keySet)
    for ((k, v) <- want) assert(math.abs(got(k) - v) < 1e-9, s"doc $k: got ${got(k)} want $v")
    // rarer terms score higher: doc2 holds the only 'window' hit
    assert(got(2L) == got.values.max)
  }

  test("unigram logprob matches a scalar re-derivation") {
    val got = TextQueries.unigramLogProb(spark, corpusDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val corpus = Seq("spark join spark", "join window table", "data table row",
      "spark spark spark spark").flatMap(_.split(" "))
    val counts = corpus.groupBy(identity).view.mapValues(_.size).toMap
    val total = corpus.size.toDouble
    val docs = Map(1L -> "spark join spark", 2L -> "join window table",
      3L -> "data table row", 4L -> "spark spark spark spark")
    for ((id, n, lp) <- got) {
      val toks = docs(id).split(" ")
      assert(n == toks.length)
      val want = toks.map(t => math.log(counts(t) / total)).sum / toks.length
      val wantR = BigDecimal(want).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(lp - wantR) < 1e-9, s"doc $id: got $lp want $wantR")
    }
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("bm25 plan: term filter reaches the exploded scan side; top-k avoids a global sort") {
    val df = TextQueries.bm25TopK(spark, "/root/testdata/sf0.001")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val cut = p.indexOf("== Initial Plan ==")
    val fin = if (cut >= 0) p.substring(0, cut) else p
    assert(fin.contains("TakeOrderedAndProject"), fin)
    // the IN-filter on query terms runs before the tf aggregate, so the
    // posting list is query-bounded, not corpus-token-bounded
    assert(fin.contains("spark,join,window") || fin.contains("spark, join, window"), fin)
    assert(fin.contains("BroadcastHashJoin"), fin)
  }
}
