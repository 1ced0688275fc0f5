package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.lake.LakeTable

/** Segment-store maintenance: OR-merge correctness across batches,
  * at-least-once replay safety (the foreachBatch contract), and
  * pruned re-reads of only the touched days.
  */
class BitmapSegmentsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def batchDf(rows: Seq[(String, String, Long)]) = {
    import spark.implicits._
    rows.map { case (et, day, uid) =>
      (et, java.sql.Timestamp.valueOf(s"$day 10:00:00"), uid)
    }.toDF("event_type", "ts", "user_id")
  }

  private def counts(t: LakeTable): Map[(String, String), Long] =
    BitmapSegments.dailyCounts(t).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) -> r.getLong(2)).toMap

  test("batches OR-merge per (type, day); replayed batch changes nothing") {
    val dir = java.nio.file.Files.createTempDirectory("seg")
    val t = new LakeTable(spark, dir.resolve("segments").toString)
    // batch 0: two days, overlapping users within a day
    BitmapSegments.mergeBatch(spark, t,
      batchDf(Seq(("a", "2024-01-01", 1L), ("a", "2024-01-01", 1L),
        ("a", "2024-01-01", 2L), ("a", "2024-01-02", 1L))), 0L)
    assert(counts(t) === Map(("a", "2024-01-01") -> 2L, ("a", "2024-01-02") -> 1L))
    // batch 1: same day new user + known user (no double count), new type
    BitmapSegments.mergeBatch(spark, t,
      batchDf(Seq(("a", "2024-01-01", 2L), ("a", "2024-01-01", 3L),
        ("b", "2024-01-01", 9L))), 1L)
    val after = counts(t)
    assert(after === Map(("a", "2024-01-01") -> 3L, ("a", "2024-01-02") -> 1L,
      ("b", "2024-01-01") -> 1L))
    // at-least-once replay of batch 1 (marker short-circuits)
    BitmapSegments.mergeBatch(spark, t,
      batchDf(Seq(("a", "2024-01-01", 2L), ("a", "2024-01-01", 3L),
        ("b", "2024-01-01", 9L))), 1L)
    assert(counts(t) === after)
    assert(t.history.size === 2, "replay must not commit")
  }

  test("a later batch's store read prunes to the touched day's files") {
    val dir = java.nio.file.Files.createTempDirectory("segprune")
    val t = new LakeTable(spark, dir.resolve("segments").toString)
    // seed several days in separate commits → separate files with day stats
    BitmapSegments.mergeBatch(spark, t, batchDf(Seq(("a", "2024-01-01", 1L))), 0L)
    BitmapSegments.mergeBatch(spark, t, batchDf(Seq(("a", "2024-01-02", 2L))), 1L)
    BitmapSegments.mergeBatch(spark, t, batchDf(Seq(("a", "2024-01-03", 3L))), 2L)
    // the pruned scan for one day must read fewer files than the store holds
    val all = t.read().inputFiles.length
    val pruned = t.scan(Seq(graft.lake.LakePredicate.In("day",
      Seq(java.sql.Date.valueOf("2024-01-03"))))).inputFiles.length
    assert(pruned < all, s"pruned=$pruned all=$all")
    // and the merge stays correct on the pruned path
    BitmapSegments.mergeBatch(spark, t, batchDf(Seq(("a", "2024-01-03", 4L))), 3L)
    assert(counts(t)(("a", "2024-01-03")) === 2L)
    assert(counts(t)(("a", "2024-01-01")) === 1L)
  }
}
