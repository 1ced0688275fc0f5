package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Overlapping-window chunking invariants on a controlled corpus:
  * full coverage (every token index falls in ≥1 chunk), correct
  * overlap (win − stride tokens shared between neighbors), a
  * shrink-wrapped tail (last chunk ends exactly at the document's
  * last token), and the boundary cases a formula bug would break
  * (doc shorter than one window → 1 chunk; doc exactly win tokens →
  * 1 chunk; win+1 tokens → 2 chunks).
  */
class ChunkOverlapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val win = 8
  private val stride = 5

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("chunks").toString
    // pure-alpha tokens: the BPE-ish regex splits "w1" into two
    // tokens ("w", "1"), so numeric suffixes would double the count
    def doc(n: Int): String = (1 to n).map(i => s"w${('a' + i - 1).toChar}").mkString(" ")
    Seq(
      (1L, doc(3), "en", "web", 10L),   // < win  → 1 chunk of 3
      (2L, doc(8), "en", "web", 20L),   // = win  → 1 chunk of 8
      (3L, doc(9), "en", "web", 21L),   // win+1  → 2 chunks (tail len 4)
      (4L, doc(23), "en", "book", 60L)) // ceil((23-8)/5)+1 = 4 chunks
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("chunk count, sizes, and boundary tokens") {
    val rows = TextQueries.chunkOverlap(spark, dir, win = win, stride = stride)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
    val byDoc = rows.groupBy(_._1)
    assert(byDoc(1L).map(x => (x._2, x._3)).toSeq === Seq((0L, 3L)))
    assert(byDoc(1L).head._4 === "wa" && byDoc(1L).head._5 === "wc")
    assert(byDoc(2L).map(x => (x._2, x._3)).toSeq === Seq((0L, 8L)))
    assert(byDoc(3L).map(x => (x._2, x._3)).toSeq.sorted === Seq((0L, 8L), (1L, 4L)))
    // tail chunk of doc 3 starts at token 6 (stride 5, 1-based) and
    // ends at the last token — shrink-wrapped, nothing dropped
    val tail3 = byDoc(3L).find(_._2 == 1L).get
    assert(tail3._4 === "wf" && tail3._5 === "wi")
    assert(byDoc(4L).map(x => (x._2, x._3)).toSeq.sorted ===
      Seq((0L, 8L), (1L, 8L), (2L, 8L), (3L, 8L)))
    val tail4 = byDoc(4L).find(_._2 == 3L).get
    assert(tail4._4 === "wp" && tail4._5 === "ww")
  }

  test("every token position is covered; neighbors overlap by win - stride") {
    val rows = TextQueries.chunkOverlap(spark, dir, win = win, stride = stride)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nTokens = Map(1L -> 3L, 2L -> 8L, 3L -> 9L, 4L -> 23L)
    rows.groupBy(_._1).foreach { case (doc, cs) =>
      val spans = cs.sortBy(_._2).map { case (_, idx, len) =>
        (idx * stride, idx * stride + len) // [start, end) 0-based
      }
      assert(spans.head._1 === 0L)
      assert(spans.last._2 === nTokens(doc), s"doc $doc tail mismatch")
      spans.toSeq.sliding(2).foreach {
        case Seq((_, e1), (s2, _)) =>
          assert(s2 < e1, s"doc $doc gap between chunks")
          assert(e1 - s2 <= (win - stride).toLong, s"doc $doc overlap too big")
        case _ => ()
      }
    }
  }
}
