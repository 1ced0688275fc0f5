package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import graft.TestSpark

/** Association-rule mining against a hand-computed oracle: support /
  * confidence / lift re-derived as closed-form scalars on a controlled
  * basket set (not a Spark-vs-Spark tautology), plus the structural
  * invariants — duplicate events don't inflate supports, pairs are
  * canonical (a < b, no self-pairs), and lift reads > 1 exactly for
  * the positively-associated pair.
  */
class AssocLiftSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("assoc").toString
    def t(s: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
    // baskets: u1={view,click} u2={view,click} u3={view} u4={click,error}
    // (u1's duplicate view must not change any count)
    Seq(
      (1L, 1L, "view", t(1), 1.0), (2L, 1L, "view", t(2), 1.0),
      (3L, 1L, "click", t(3), 1.0),
      (4L, 2L, "view", t(4), 1.0), (5L, 2L, "click", t(5), 1.0),
      (6L, 3L, "view", t(6), 1.0),
      (7L, 4L, "click", t(7), 1.0), (8L, 4L, "error", t(8), 1.0))
      .toDF("event_id", "user_id", "event_type", "ts", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("support, confidence, and lift match the closed form") {
    val rows = AnalyticsQueries.assocLift(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    // pairs present: (click,error) from u4; (click,view) from u1,u2
    assert(rows.keySet === Set(("click", "error"), ("click", "view")))
    val n = 4.0
    val (scClick, scView, scError) = (3.0, 3.0, 1.0)
    val cv = rows(("click", "view"))
    assert(cv._1 === 2L)
    assert(math.abs(cv._2 - 2.0 / n) < 1e-6)          // support
    assert(math.abs(cv._3 - 2.0 / scClick) < 1e-6)    // confidence P(view|click)
    assert(math.abs(cv._4 - (2.0 * n) / (scClick * scView)) < 1e-6) // lift 8/9
    val ce = rows(("click", "error"))
    assert(ce._1 === 1L)
    assert(math.abs(ce._4 - (1.0 * n) / (scClick * scError)) < 1e-6) // lift 4/3
    // error only ever co-occurs with click → positive association
    assert(ce._4 > 1.0 && cv._4 < 1.0)
  }
}
