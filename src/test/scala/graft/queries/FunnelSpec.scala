package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Funnel and cohort semantics against hand-computed answers on a
  * controlled event fixture — strict time ordering is the part a
  * per-type count cannot express, so it is what the fixture stresses
  * (wrong-order steps, equal timestamps, repeat visits).
  */
class FunnelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("funnel").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    Seq(
      // u1: full ordered funnel
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0, "{}"),
      (2L, ts("2024-01-01 10:05:00"), 1L, "click", 1.0, "{}"),
      (3L, ts("2024-01-02 10:10:00"), 1L, "purchase", 1.0, "{}"),
      // u2: click BEFORE first view — funnel must stop at view
      (4L, ts("2024-01-01 09:00:00"), 2L, "click", 1.0, "{}"),
      (5L, ts("2024-01-01 11:00:00"), 2L, "view", 1.0, "{}"),
      // u3: click at the SAME instant as view — strict > excludes it
      (6L, ts("2024-01-01 12:00:00"), 3L, "view", 1.0, "{}"),
      (7L, ts("2024-01-01 12:00:00"), 3L, "click", 1.0, "{}"),
      // u4: never views — not in the funnel at all
      (8L, ts("2024-01-03 08:00:00"), 4L, "purchase", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("strict ordering: same-instant and out-of-order steps do not convert") {
    val got = AnalyticsQueries.funnelSteps(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq(
      ("1_view", 3L, 1.0),      // u1, u2, u3
      ("2_click", 1L, 0.333333), // only u1 (u2 clicked first, u3 tied)
      ("3_purchase", 1L, 0.333333)))
  }

  test("cohort offsets count distinct active days from first-seen") {
    val got = AnalyticsQueries.cohortRetention(spark, dir)
      .collect().map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2))).toSet
    assert(got == Set(
      ("2024-01-01", 0, 3L), // u1, u2, u3 first seen Jan 1
      ("2024-01-01", 1, 1L), // u1 returns Jan 2
      ("2024-01-03", 0, 1L)))
  }
}
