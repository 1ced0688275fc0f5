package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** At-ingest incremental dedup: final kept set must equal the batch
  * exhaustive answer regardless of arrival order — including the
  * retroactive-tombstone case where the SMALLER-id member of a pair
  * arrives after its larger partner was already indexed and kept.
  */
class IncrementalDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ids interleave as id % 4 slices; the (2, 5) near-pair puts doc 5
  // (slice 1) in the index BEFORE doc 2 (slice 2) arrives — doc 5's
  // drop is retroactive. (0, 4) share slice 0 — in-batch pair.
  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again today"),
    (1L, "completely different text about spark shuffles and parquet footers"),
    (2L, "incremental minhash dedup indexes every batch of arriving documents"),
    (3L, "yet another unrelated document mentioning windows and watermarks"),
    (4L, "the quick brown fox jumps over the lazy dog again and again tonight"),
    (5L, "incremental minhash dedup indexes every batch of arriving document"),
    (6L, "sixth text with no resemblance to anything else in this tiny corpus"),
    (7L, "seventh text equally dissimilar from the rest of the small corpus"))
    .toDF("doc_id", "text")

  test("kept set equals the exhaustive batch answer; retro-tombstone fires") {
    val work = java.nio.file.Files.createTempDirectory("incdedup")
    val got = IncrementalDedup.dedupAtIngest(spark, docs, work)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap

    // exhaustive batch oracle: dropped = larger id of any pair
    val pairs = Dedup.ngramJaccardPairs(docs, threshold = 0.5)
      .select($"a_id", $"b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val droppedBatch = pairs.map(_._2).toSet
    assert(pairs.nonEmpty, "fixture must contain near-dup pairs")
    (0L to 7L).foreach { id =>
      assert(got(id) == !droppedBatch(id), s"doc $id: got ${got(id)}")
    }
    // the cross-slice pair (2, 5) must have dropped 5 retroactively
    assert(pairs.contains((2L, 5L)) || pairs.contains((0L, 4L)))
    assert(!got(5L) && got(2L))
    assert(!got(4L) && got(0L))
  }

  test("kept set is invariant to how arrivals are sliced") {
    def run(slices: Int): Map[Long, Boolean] = {
      val work = java.nio.file.Files.createTempDirectory(s"incdedup$slices")
      IncrementalDedup.dedupAtIngest(spark, docs, work, slices = slices)
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    }
    // 1 slice = pure batch; 2 and 5 exercise different cross-batch
    // pair orientations — the tombstone rule must erase the difference
    val one = run(1)
    assert(run(2) == one)
    assert(run(5) == one)
  }
}
