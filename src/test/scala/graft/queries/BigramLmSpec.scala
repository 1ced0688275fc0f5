package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Bigram-LM scoring against a hand-computed oracle on a controlled
  * corpus — an independent scalar re-derivation of the add-one
  * smoothing formula ln((c(w1,w2)+1)/(c(w1)+V)), not a
  * Spark-vs-Spark tautology. Also pins that a fluent (repeated)
  * sequence outscores word salad, the signal the filter exists for.
  */
class BigramLmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("bigram").toString
    Seq(
      (1L, "a b a b", "en", "web", 7L),  // fluent: "a b" twice, "b a" once
      (2L, "c d", "en", "web", 3L),      // singleton bigram
      (3L, "x", "en", "web", 1L))        // no bigrams → absent from output
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("mean logprob matches the closed-form computation") {
    // unigrams: a=2 b=2 c=1 d=1 x=1 → V=5
    // bigrams:  (a,b)=2 (b,a)=1 (c,d)=1
    val V = 5.0
    def lp(bc: Int, uc: Int): Double = math.log((bc + 1.0) / (uc + V))
    val exp1 = (lp(2, 2) + lp(1, 2) + lp(2, 2)) / 3.0 // a b, b a, a b
    val exp2 = lp(1, 1)
    val got = TextQueries.bigramLogProb(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet === Set(1L, 2L), "single-token docs have no bigrams")
    assert(got(1L)._1 === 3L)
    assert(got(2L)._1 === 1L)
    assert(math.abs(got(1L)._2 - exp1) < 1e-6, s"doc1: ${got(1L)._2} vs $exp1")
    assert(math.abs(got(2L)._2 - exp2) < 1e-6, s"doc2: ${got(2L)._2} vs $exp2")
    // the fluent doc (repeated observed bigram) outscores the singleton
    assert(got(1L)._2 > got(2L)._2)
  }
}
