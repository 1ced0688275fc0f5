package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** N-gram novelty on a controlled corpus where first-occurrence
  * attribution is decidable by hand: an original doc, a verbatim
  * copy, a half-recombination, and a fully fresh doc.
  */
class NoveltySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("novelty").toString
    val a = "the quick brown fox jumps over the lazy dog today"
    // doc 2 copies doc 1 verbatim; doc 3 splices doc 1's head onto
    // fresh text; doc 4 shares nothing
    Seq(
      (1L, a, "en", "web", 50L),
      (2L, a, "en", "web", 50L),
      (3L, "the quick brown fox eats fresh red berries quietly", "en", "web", 50L),
      (4L, "completely new words appear in this final document here", "en", "web", 55L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("novelty attributes shingles to their first-occurrence doc") {
    val rows = TextQueries.novelty(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // doc 1: 10 words → 8 distinct 3-shingles ("the" repeats but no
    // shingle does), all first-seen here
    assert(rows(1L) === ((8L, 8L, 1.0)))
    // doc 2 is a verbatim copy: zero novel shingles
    assert(rows(2L) === ((8L, 0L, 0.0)))
    // doc 3: 9 words → 7 shingles; shares exactly "the quick brown"
    // and "quick brown fox" with doc 1, the other 5 are fresh
    assert(rows(3L) === ((7L, 5L, 5.0 / 7.0)))
    // doc 4: 9 words → 7 shingles, all fresh
    assert(rows(4L) === ((7L, 7L, 1.0)))
  }

  test("shingleCard counts distinct 3-shingles per doc") {
    val rows = TextQueries.shingleCard(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows === Map(1L -> 8L, 2L -> 8L, 3L -> 7L, 4L -> 7L))
  }
}
