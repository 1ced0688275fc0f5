package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** OLS trend, lag-1 autocorrelation, and Benford first-digit QC on
  * controlled series where the closed forms are known exactly.
  */
class TrendSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** events fixture: (event_id, secondsOffset, event_type, value) */
  private def writeEvents(rows: Seq[(Long, Long, String, Double)]): String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("trend").toString
    val t0 = graft.SqlCompat.utcTimestamp("2024-01-01 00:00:00").getTime
    rows.map { case (id, sec, et, v) =>
      (id, new java.sql.Timestamp(t0 + sec * 1000L), id, et, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("regrTrend recovers an exact line (r2=1) and the sign of a falling one") {
    // "up": y = 10 + 0.005·sec (noise-free) → slope 432/day, r2 = 1
    val up = for (i <- 0L until 50L) yield
      (i, i * 60L, "up", 10.0 + 0.005 * (i * 60L))
    // "down": y = 100 − 0.001·sec
    val down = for (i <- 0L until 50L) yield
      (100L + i, i * 60L, "down", 100.0 - 0.001 * (i * 60L))
    val dir = writeEvents(up ++ down)
    val rows = AnalyticsQueries.regrTrend(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val (un, uSlope, uIcept, uR2) = rows("up")
    assert(un === 50L)
    assert(math.abs(uSlope - 0.005 * 86400.0) < 1e-6, s"slope $uSlope")
    assert(math.abs(uIcept - 10.0) < 1e-6, s"intercept $uIcept")
    assert(math.abs(uR2 - 1.0) < 1e-9, s"r2 $uR2")
    val (_, dSlope, _, dR2) = rows("down")
    assert(dSlope < 0.0 && math.abs(dR2 - 1.0) < 1e-9)
  }

  test("autocorr: alternating series ≈ −1, linear ramp → strongly positive") {
    val alt = for (i <- 0L until 60L) yield
      (i, i * 10L, "alt", if (i % 2 == 0) 10.0 else 20.0)
    val ramp = for (i <- 0L until 60L) yield
      (100L + i, i * 10L, "ramp", i * 1.0)
    val dir = writeEvents(alt ++ ramp)
    val rows = AnalyticsQueries.autocorr(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows("alt")._1 === 59L)
    assert(rows("alt")._2 < -0.95, s"alt r ${rows("alt")._2}")
    assert(rows("ramp")._2 > 0.95, s"ramp r ${rows("ramp")._2}")
  }

  test("benford: digits counted from the significant digit, frequencies sum to 1") {
    // 0.0234 → digit 2 (leading zeros skipped); 150.0 → 1; 9.99 → 9;
    // zero and negatives excluded
    val rows = Seq(
      (0L, 0L, "x", 0.0234), (1L, 1L, "x", 150.0), (2L, 2L, "x", 150.0),
      (3L, 3L, "x", 9.99), (4L, 4L, "x", 0.0), (5L, 5L, "x", -7.0))
    val dir = writeEvents(rows)
    val out = AnalyticsQueries.benfordDigits(spark, dir).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out.keySet === Set(1, 2, 9))
    assert(out(1)._1 === 2L && out(2)._1 === 1L && out(9)._1 === 1L)
    assert(math.abs(out.values.map(_._2).sum - 1.0) < 1e-12)
    assert(math.abs(out(1)._3 - math.log10(2.0)) < 1e-12) // Benford P(1)
  }
}
