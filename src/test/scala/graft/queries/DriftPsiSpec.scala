package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** PSI drift detection on controlled slices: identical distributions
  * score ~0; a wholesale bin shift scores far above the classic 0.25
  * "significant drift" line; silent bins stay defined via smoothing.
  */
class DriftPsiSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def writeEvents(rows: Seq[(Long, Long, String, Double)]): String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("psi").toString
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    rows.map { case (id, uid, et, v) => (id, ts, uid, et, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("identical slices score ~0; a shifted slice crosses the drift line") {
    // "stable": both parities uniform over bins 0-4 (values 5,15,..,45)
    val stable = for (i <- 0L until 100L) yield
      (i, i, "stable", (i % 5) * 10.0 + 5.0)
    // "drifted": even ids in bins 0-1, odd ids in bins 8-9
    val drifted = for (i <- 0L until 100L) yield
      (1000L + i, i, "drifted",
        if (i % 2 == 0) (i % 2L + (i / 2) % 2) * 10.0 + 5.0 else 80.0 + ((i / 2) % 2) * 10.0 + 5.0)
    val dir = writeEvents(stable ++ drifted)
    val rows = AnalyticsQueries.driftPsi(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val (sa, sb, sPsi) = rows("stable")
    assert(sa === 50L && sb === 50L)
    assert(math.abs(sPsi) < 0.01, s"stable psi $sPsi")
    val (da, db, dPsi) = rows("drifted")
    assert(da === 50L && db === 50L)
    assert(dPsi > 0.25, s"drifted psi $dPsi") // classic "significant drift"
    assert(dPsi.isFinite) // smoothing keeps empty bins defined
  }
}
