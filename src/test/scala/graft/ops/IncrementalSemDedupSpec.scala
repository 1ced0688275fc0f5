package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** At-ingest semantic dedup: the kept set must equal the batch
  * exhaustive cosine-pair answer regardless of arrival order,
  * including retroactive tombstones when a copy is indexed BEFORE its
  * smaller-id original arrives, and regardless of whether the
  * candidate pairs take the collected/broadcast or the capped
  * distributed verify path.
  */
class IncrementalSemDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 8

  // 8 base vectors, deterministic and mutually far apart in cosine;
  // copies of 1 and 6 are planted at +100/+101 so one copy shares its
  // original's slice (pmod 4) and one does not (retro-tombstone path:
  // 107 % 4 = 3 arrives before... ids: 1,2,...; copyA = 101 (101%4=1,
  // same slice as 1), copyB = 106+... see below)
  // centered coordinates (signs vary) so distinct seeds land far
  // apart in cosine; an all-positive fixture would sit near cos ≈ 1
  private def vec(seed: Long): Array[Float] =
    Array.tabulate(dim)(i =>
      (((seed * 2654435761L + (i + 1) * (seed + 7) * 40503L) % 1000) / 1000.0f) - 0.5f)

  private val base = (0L until 8L).map(i => (i, vec(i)))
  // copy of 1 at id 101 (slice 1 — same slice, in-batch pair) and copy
  // of 6 at id 103 (slice 3, original 6 in slice 2 — cross-batch; and
  // 103 > 6 so the copy is dropped whichever arrives first)
  private val docs =
    (base :+ (101L, vec(1L)) :+ (103L, vec(6L))).toDF("vec_id", "embedding")

  private def runKept(cap: Int): Map[Long, Boolean] = {
    val work = java.nio.file.Files.createTempDirectory(s"incsem$cap")
    IncrementalSemDedup.dedupAtIngest(spark, docs, work, dim = dim,
      candPairCap = cap)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
  }

  test("kept set equals the exhaustive cosine-pair answer") {
    val got = runKept(IncrementalDedup.DefaultCandPairCap)
    // exhaustive oracle: brute-force all pairs, drop the larger id of
    // any pair at cosine >= 0.99
    val rows = docs.as[(Long, Array[Float])].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val dropped = (for {
      (ai, av) <- rows; (bi, bv) <- rows
      if ai < bi && cos(av, bv) >= 0.99
    } yield bi).toSet
    assert(dropped === Set(101L, 103L), "only the planted copies are near-dups")
    rows.foreach { case (id, _) =>
      assert(got(id) === !dropped(id), s"vec $id: got ${got(id)}")
    }
  }

  test("over-cap candidates take the distributed verify path, same answer") {
    assert(runKept(1) === runKept(IncrementalDedup.DefaultCandPairCap))
  }

  test("second ingest dedups against the persisted index (cross-session)") {
    val work = java.nio.file.Files.createTempDirectory("incsem-2nd")
    IncrementalSemDedup.ingest(spark, docs, work, "first", dim = dim)
    // a later crawl re-delivers vector 2's embedding under a new id
    // plus one genuinely new vector — only the re-delivery is dropped
    val second = Seq((200L, vec(2L)), (201L, vec(42L))).toDF("vec_id", "embedding")
    IncrementalSemDedup.ingest(spark, second, work, "second", dim = dim)
    val got = IncrementalDedup.keptReport(spark,
      docs.unionByName(second), work, "vec_id")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(!got(200L), "re-delivered embedding must be tombstoned")
    assert(got(201L), "novel embedding must be kept")
    assert(got(2L), "the original stays kept")
  }
}
