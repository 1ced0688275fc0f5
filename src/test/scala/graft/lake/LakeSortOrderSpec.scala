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
    // the declaration must SURVIVE the compact — or the next append
    // silently de-clusters the table
    assert(t.latest.get.meta.get(FileStats.SortOrderKey).contains("id"))
    val probe = t.scan(Seq(
      LakePredicate.GtEq("id", 100L), LakePredicate.LtEq("id", 150L)))
    assert(probe.count() === 51L)
    assert(scannedFiles(probe) === 1L,
      "post-compact files must stay clustered on the declared order")
    assert(t.read(None).count() === 4000L)
  }

  // grid data scrambled on arrival: x in [0,n), y = multiplicative
  // hash of x (independent of x's order) — lexicographic (x,y)
  // clustering bounds ONLY x; z-order bounds both
  private def grid(lo: Long, hi: Long) =
    spark.range(lo, hi).select($"id".as("x"),
      pmod($"id" * 2654435761L, lit(10000L)).as("y"))
      .orderBy(rand(seed = 7))
  private def yCount(lo: Long, hi: Long): Long =
    spark.range(0, 6000).select(pmod($"id" * 2654435761L, lit(10000L)).as("y"))
      .where($"y".between(lo, hi)).count()

  test("zorderBy: every listed dimension prunes across appends; compact inherits; sortedBy control cannot") {
    // tiny fixtures coalesce to one file per commit under AQE, which
    // hides intra-commit pruning (production files split on size);
    // pin 8 clustered output files per commit for the assertion
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prevCoalesce = spark.conf.get(coalesceKey)
    val partsKey = "spark.sql.shuffle.partitions"
    val prevParts = spark.conf.get(partsKey)
    spark.conf.set(coalesceKey, "false")
    spark.conf.set(partsKey, "8")
    val (t, t2) = try {
      val cat = new LakeCatalog(spark, Files.createTempDirectory("zord-").toString)
      cat.write(grid(0, 2000), "ns.z", WriteMode.Overwrite, zorderBy = Seq("x", "y"))
      val t = cat.table("ns.z")
      t.write(grid(2000, 4000), WriteMode.Append)
      t.write(grid(4000, 6000), WriteMode.Append)
      val cat2 = new LakeCatalog(spark, Files.createTempDirectory("zord-c-").toString)
      cat2.write(grid(0, 2000), "ns.s", WriteMode.Overwrite, sortedBy = Seq("x", "y"))
      val t2 = cat2.table("ns.s")
      t2.write(grid(2000, 4000), WriteMode.Append)
      t2.write(grid(4000, 6000), WriteMode.Append)
      (t, t2)
    } finally {
      spark.conf.set(coalesceKey, prevCoalesce)
      spark.conf.set(partsKey, prevParts)
    }
    assert(t.latest.get.meta(FileStats.SortOrderKey) === "z:x,y")
    val total = t.latest.get.dirs.map(d => t.io.countFiles(t.loc(d), ".parquet")).sum
    assert(total >= 12, s"want several files per commit, got $total")

    // the SECOND dimension prunes too — the whole point of z-order
    val yProbe = t.scan(Seq(LakePredicate.GtEq("y", 7000L), LakePredicate.LtEq("y", 7050L)))
    assert(yProbe.count() === yCount(7000L, 7050L))
    val yRead = scannedFiles(yProbe)
    assert(yRead < total, s"z-order must prune on y (read $yRead of $total)")
    val xProbe = t.scan(Seq(LakePredicate.GtEq("x", 100L), LakePredicate.LtEq("x", 150L)))
    assert(xProbe.count() === 51L)
    assert(scannedFiles(xProbe) < total)

    // control: lexicographic (x,y) cannot bound a y-only probe
    val yCtl = t2.scan(Seq(LakePredicate.GtEq("y", 7000L), LakePredicate.LtEq("y", 7050L)))
    assert(yCtl.count() === yCount(7000L, 7050L))
    val t2total = t2.latest.get.dirs.map(d => t2.io.countFiles(t2.loc(d), ".parquet")).sum
    val ctlRead = scannedFiles(yCtl)
    assert(ctlRead === t2total,
      s"lexicographic clustering should NOT prune the trailing dimension (control: $ctlRead of $t2total)")

    // unqualified compact() keeps the z clustering AND the declaration
    t.compact(targetPartitions = 8)
    assert(t.latest.get.meta(FileStats.SortOrderKey) === "z:x,y")
    val afterTotal = t.latest.get.dirs.map(d => t.io.countFiles(t.loc(d), ".parquet")).sum
    val yAfter = t.scan(Seq(LakePredicate.GtEq("y", 7000L), LakePredicate.LtEq("y", 7050L)))
    assert(yAfter.count() === yCount(7000L, 7050L))
    assert(scannedFiles(yAfter) < afterTotal)
    assert(t.read(None).count() === 6000L)
  }

  test("compaction and binpack preserve bloom + clustering declarations") {
    val cat = new LakeCatalog(spark, Files.createTempDirectory("prop-keep-").toString)
    cat.write(shuffled(0, 2000).repartition(4), "ns.k", WriteMode.Overwrite,
      sortedBy = Seq("id"), bloomBy = Seq("v"))
    val t = cat.table("ns.k")
    t.compact(targetPartitions = 2)
    assert(t.latest.get.meta.get(FileStats.SortOrderKey).contains("id"))
    assert(t.latest.get.meta.get(FileStats.BloomColsKey).contains("v"))
    // an append AFTER the compact still clusters (the decay bug this guards)
    t.write(shuffled(2000, 4000).repartition(4), WriteMode.Append)
    val probe = t.scan(Seq(LakePredicate.GtEq("id", 2100L), LakePredicate.LtEq("id", 2150L)))
    assert(probe.count() === 51L)
    val total = t.latest.get.dirs.map(d => t.io.countFiles(t.loc(d), ".parquet")).sum
    assert(scannedFiles(probe) < total, "post-compact appends must stay clustered")
    t.write(shuffled(4000, 4100), WriteMode.Append)
    t.compactBinPack(maxDirBytes = 32 * 1024)
    assert(t.latest.get.meta.get(FileStats.SortOrderKey).contains("id"))
    assert(t.latest.get.meta.get(FileStats.BloomColsKey).contains("v"))
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
