package graft.lake

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Declared table sort orders: writes range-distribute + sort on the
  * persisted `sortedBy` columns, so every commit's files stay
  * range-disjoint and per-file stats stay tight — clustering does NOT
  * decay with appends, and compaction defaults to the same order.
  */
class LakeSortOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s.metrics("numFiles").value
    }.sum
  }

  private def shuffled(lo: Long, hi: Long) =
    spark.range(lo, hi).select($"id", ($"id" % 7).cast("double").as("v"))
      .orderBy(rand(seed = 42)) // arrival order is scrambled

  test("range scans keep skipping across appends — no compaction needed") {
    val cat = new LakeCatalog(spark, Files.createTempDirectory("sort-spec-").toString)
    cat.write(shuffled(0, 4000).repartition(4), "ns.s", WriteMode.Overwrite,
      sortedBy = Seq("id"))
    val t = cat.table("ns.s")
    // two appends of scrambled data: a sort-order-less table would land
    // them as full-range files and skipping would decay to nothing
    t.write(shuffled(4000, 8000).repartition(4), WriteMode.Append)
    t.write(shuffled(8000, 12000).repartition(4), WriteMode.Append)
    val total = t.latest.get.dirs.map(d =>
      t.io.countFiles(t.loc(d), ".parquet")).sum
    assert(total >= 3, "each commit should hold at least one file")
    val narrow = t.scan(Seq(
      LakePredicate.GtEq("id", 5000L), LakePredicate.LtEq("id", 5050L)))
    assert(narrow.select($"id").as[Long].collect().sorted === (5000L to 5050L).toArray)
    // the probe range lives in ONE commit; range-disjoint files within
    // each commit mean at most one file per overlapping boundary
    assert(scannedFiles(narrow) <= 2L,
      s"sorted appends must keep files range-disjoint (read ${scannedFiles(narrow)} of $total)")
  }

  test("sort order persists in metadata; compact() honors it by default") {
    val cat = new LakeCatalog(spark, Files.createTempDirectory("sort-comp-").toString)
    cat.write(shuffled(0, 2000).repartition(4), "ns.s", WriteMode.Overwrite,
      sortedBy = Seq("id"))
    val t = cat.table("ns.s")
    t.write(shuffled(2000, 4000).repartition(4), WriteMode.Append)
    t.compact(targetPartitions = 4) // no sortBy argument: inherits
    assert(t.latest.get.meta.get(FileStats.SortOrderKey).isEmpty === false
      || t.latest.get.op === "compact")
    val probe = t.scan(Seq(
      LakePredicate.GtEq("id", 100L), LakePredicate.LtEq("id", 150L)))
    assert(probe.count() === 51L)
    assert(scannedFiles(probe) === 1L,
      "post-compact files must stay clustered on the declared order")
    assert(t.read(None).count() === 4000L)
  }

  test("a column missing from an evolved write does not break the sort contract") {
    val cat = new LakeCatalog(spark, Files.createTempDirectory("sort-evo-").toString)
    cat.write(shuffled(0, 100), "ns.s", WriteMode.Overwrite, sortedBy = Seq("id", "v"))
    val t = cat.table("ns.s")
    t.dropColumn("v")
    // append under the evolved schema: the stale sort column is ignored
    t.write(spark.range(100, 200).select($"id"), WriteMode.Append)
    assert(t.read(None).count() === 200L)
  }
}
