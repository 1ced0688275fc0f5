package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Interpolation and EWMA semantics against hand-computed answers on a
  * controlled event fixture. The parts a dense aggregate cannot
  * express are what the fixture stresses: interior gaps (straight
  * line between neighbors), leading/trailing edges (hold, never
  * extrapolate), and the EWMA's strictly-preceding frame (the flagged
  * hour must not smooth itself).
  */
class TimeSeriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("timeseries").toString
    def ts(s: String) = graft.SqlCompat.utcTimestamp(s)
    Seq(
      // type a: observed in 5-min buckets 0 and 3 of Jan 2 — the
      // idx 1-2 gap interpolates on the 10 -> 4 line; everything
      // after idx 3 is a trailing edge holding 4.0
      (1L, ts("2024-01-02 00:02:00"), 1L, "a", 10.0, "{}"),
      (2L, ts("2024-01-02 00:15:30"), 1L, "a", 4.0, "{}"),
      // type b: a single observation (bucket 10) — every other
      // bucket is an edge holding 7.5
      (3L, ts("2024-01-02 00:50:00"), 2L, "b", 7.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("interior gaps take the line between neighbors; edges hold") {
    val rows = AnalyticsQueries.interpolate(spark, dir).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString,
        r.getDouble(2), r.getString(3)))
    assert(rows.length == 2 * 288)
    val byBucket = rows.map(t => ((t._1, t._2), (t._3, t._4))).toMap
    assert(byBucket(("a", "2024-01-02 00:00:00.0")) == (10.0, "obs"))
    assert(byBucket(("a", "2024-01-02 00:05:00.0")) == (8.0, "interp"))
    assert(byBucket(("a", "2024-01-02 00:10:00.0")) == (6.0, "interp"))
    assert(byBucket(("a", "2024-01-02 00:15:00.0")) == (4.0, "obs"))
    // trailing edge: holds the last observed value, no extrapolation
    assert(byBucket(("a", "2024-01-02 23:55:00.0")) == (4.0, "edge"))
    // single-observation series: obs at its bucket, edges elsewhere
    assert(byBucket(("b", "2024-01-02 00:50:00.0")) == (7.5, "obs"))
    assert(byBucket(("b", "2024-01-02 00:00:00.0")) == (7.5, "edge"))
    assert(byBucket(("b", "2024-01-02 23:00:00.0")) == (7.5, "edge"))
  }

  test("sessionize: 30-min gap boundary is inclusive, 1s past it breaks") {
    val d = java.nio.file.Files.createTempDirectory("sessionize").toString
    def ts(s: String) = graft.SqlCompat.utcTimestamp(s)
    Seq(
      // u1: 1800s gap exactly — SAME session (break is strict >)
      (1L, ts("2024-01-05 01:00:00"), 1L, "view", 1.0, "{}"),
      (2L, ts("2024-01-05 01:30:00"), 1L, "view", 2.0, "{}"),
      // then 1801s — NEW session
      (3L, ts("2024-01-05 02:00:01"), 1L, "view", 4.0, "{}"),
      // u2: single event, single session
      (4L, ts("2024-01-05 09:00:00"), 2L, "click", 8.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = AnalyticsQueries.sessionizeBatch(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).toString,
        r.getTimestamp(3).toString, r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == Seq(
      (1L, 1L, "2024-01-05 01:00:00.0", "2024-01-05 01:30:00.0", 2L, 3.0),
      (1L, 2L, "2024-01-05 02:00:01.0", "2024-01-05 02:00:01.0", 1L, 4.0),
      (2L, 1L, "2024-01-05 09:00:00.0", "2024-01-05 09:00:00.0", 1L, 8.0)))
  }

  test("EWMA frame is strictly preceding and zero-filled") {
    val rows = AnalyticsQueries.ewmaAnomaly(spark, dir).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString,
        r.getLong(2), r.getDouble(3), r.getBoolean(4)))
    // 720-hour grid minus the 6 warm-up hours, per type
    assert(rows.length == 2 * 714)
    val byHour = rows.map(t => ((t._1, t._2), (t._3, t._4, t._5))).toMap
    // hour 24 (Jan 2, 00:00) holds both `a` events: n=2, trailing
    // hours all silent -> ewma 0, and 2 > 2*0 flags high
    assert(byHour(("a", "2024-01-02 00:00:00.0")) == (2L, 0.0, true))
    // next hour: only lag1 is non-zero -> ewma = 32*2/63
    val h25 = byHour(("a", "2024-01-02 01:00:00.0"))
    assert(h25._1 == 0L && math.abs(h25._2 - 64.0 / 63.0) < 1e-12)
    assert(h25._3) // 0 < 0.5 * ewma -> flagged low
    // six silent hours later the burst has fully decayed
    assert(byHour(("a", "2024-01-02 07:00:00.0")) == (0L, 0.0, false))
    // `b`'s single event weighs half of `a`'s pair
    val b25 = byHour(("b", "2024-01-02 01:00:00.0"))
    assert(b25._1 == 0L && math.abs(b25._2 - 32.0 / 63.0) < 1e-12)
  }
}
