package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import graft.TestSpark

/** Transition-matrix math against a hand-computed oracle, including
  * the tied-timestamp case: two events at the same instant must order
  * by event_id (deterministic), not arbitrarily.
  */
class EventTransitionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("transitions").toString
    def t(s: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
    // u1: view->click->view   u2: view->click  u3: view (no transition)
    // u4: TWO events at the same ts — event_id order makes it
    // signup(10)->error(11), never the reverse
    Seq(
      (1L, 1L, "view", t(1), 1.0), (2L, 1L, "click", t(2), 1.0),
      (3L, 1L, "view", t(3), 1.0),
      (4L, 2L, "view", t(4), 1.0), (5L, 2L, "click", t(5), 1.0),
      (6L, 3L, "view", t(6), 1.0),
      (10L, 4L, "signup", t(7), 1.0), (11L, 4L, "error", t(7), 1.0))
      .toDF("event_id", "user_id", "event_type", "ts", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("transition counts and probabilities match the closed form") {
    val rows = AnalyticsQueries.eventTransitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    // transitions: view->click ×2 (u1, u2), click->view ×1 (u1),
    // signup->error ×1 (u4, tiebreak by event_id)
    assert(rows.keySet === Set(
      ("view", "click"), ("click", "view"), ("signup", "error")))
    assert(rows(("view", "click")) === (2L, 1.0))   // 2 of 2 from view
    assert(rows(("click", "view")) === (1L, 1.0))
    assert(rows(("signup", "error")) === (1L, 1.0))
    assert(!rows.contains(("error", "signup")), "tied ts must order by event_id")
  }
}
