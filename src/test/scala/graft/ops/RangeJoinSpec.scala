package graft.ops

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Binned range join: equals the naive inequality join row-for-row
  * (bounds inclusive, keys isolate, intervals spanning many bins don't
  * duplicate pairs), and never plans a nested loop.
  */
class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("matches the naive join exactly, including multi-bin spans and bound edges") {
    val points = (0L until 500L).map(i =>
      (i, i % 7, ts(i * 13))).toDF("pid", "k", "t")
    val intervals = (0L until 80L).map(i =>
      // spans from 0 to ~40 bins wide at binSeconds=60
      (i + 1000L, i % 7, ts(i * 77), ts(i * 77 + (i % 40) * 60))).toDF("iid", "k", "lo", "hi")
    val binned = RangeJoin.pointInInterval(points, "t", intervals, "lo", "hi",
      keys = Seq("k"), binSeconds = 60)
      .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSorted
    val naive = points.join(intervals, Seq("k"))
      .where($"t" >= $"lo" && $"t" <= $"hi")
      .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSorted
    assert(binned.nonEmpty)
    assert(binned === naive)
  }

  implicit class Sortable(a: Array[(Long, Long)]) {
    def toSorted: Seq[(Long, Long)] = a.toSeq.sorted
  }

  test("no nested-loop or cartesian node in the plan") {
    val points = (0L until 100L).map(i => (i, i % 3, ts(i * 10))).toDF("pid", "k", "t")
    val intervals = (0L until 10L).map(i =>
      (i + 500L, i % 3, ts(i * 100), ts(i * 100 + 120))).toDF("iid", "k", "lo", "hi")
    val df = RangeJoin.pointInInterval(points, "t", intervals, "lo", "hi",
      keys = Seq("k"), binSeconds = 60)
    df.collect()
    def scan(p: org.apache.spark.sql.execution.SparkPlan): Boolean = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scan(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scan(q.plan)
      case _: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => false
      case _: org.apache.spark.sql.execution.joins.CartesianProductExec => false
      case other => other.children.forall(scan)
    }
    assert(scan(df.queryExecution.executedPlan))
  }
}
