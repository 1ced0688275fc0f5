package graft.lake

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Predicate-scoped compaction ([[LakeTable.compactWhere]] — Iceberg's
  * `rewrite_data_files(where => ...)`): the rewrite is bounded to dirs
  * whose manifest stats overlap the predicate, cold dirs carry
  * untouched, and the predicate is a SCOPE, never a row filter.
  */
class CompactWhereSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(r: Range) =
    r.map(i => (i.toLong, s"name$i", i * 1.5)).toDF("id", "name", "v")

  private def fresh(): LakeCatalog =
    new LakeCatalog(spark, Files.createTempDirectory("cw-wh-").toString)

  test("only overlapping dirs rewrite; cold dirs carry with their stats") {
    val cat = fresh()
    cat.write(df(1 to 1000), "ns.t", WriteMode.Overwrite, statsBy = Seq("id"))
    val t = cat.table("ns.t")
    t.write(df(1001 to 2000), WriteMode.Append)
    t.write(df(2001 to 3000), WriteMode.Append)
    t.write(df(2500 to 2600), WriteMode.Append) // overlaps the third commit's range
    val before = t.latest.get
    assert(before.dirs.size === 4)
    val cold = before.dirs.take(2).toSet

    val snap = t.compactWhere(Seq(
      LakePredicate.GtEq("id", 2400L), LakePredicate.LtEq("id", 2700L)))
    // the two cold dirs survive BY NAME; the two hot dirs folded to one
    assert(snap.dirs.size === 3)
    assert(cold.subsetOf(snap.dirs.toSet), "cold dirs must carry untouched")
    assert(snap.dirs.exists(d => !before.dirs.contains(d)))
    // cold dirs keep their stats and byte/row meta
    cold.foreach { d =>
      assert(snap.meta.contains(FileStats.dirKey(d)))
      assert(snap.meta.contains(FileStats.bytesKey(d)))
    }
    // scope, not filter: every row survives, including non-matching
    // rows of the rewritten dirs
    assert(t.read().count() === 3101L)
    assert(t.read().where($"id".between(2500L, 2600L)).count() === 202L)
  }

  test("disjoint predicate is a no-op commit-wise") {
    val cat = fresh()
    cat.write(df(1 to 100), "ns.n", WriteMode.Overwrite, statsBy = Seq("id"))
    val t = cat.table("ns.n")
    t.write(df(101 to 200), WriteMode.Append)
    val v = t.latest.get.version
    val snap = t.compactWhere(Seq(LakePredicate.GtEq("id", 10000L)))
    assert(snap.version === v, "nothing overlaps — no commit")
  }

  test("stats-less dirs rewrite conservatively") {
    val cat = fresh()
    cat.write(df(1 to 100), "ns.s", WriteMode.Overwrite) // no statsBy
    val t = cat.table("ns.s")
    t.write(df(101 to 200), WriteMode.Append)
    val snap = t.compactWhere(Seq(LakePredicate.EqualTo("id", 5L)))
    // no stats to prove disjointness → both dirs fold
    assert(snap.dirs.size === 1)
    assert(t.read().count() === 200L)
  }

  test("live deletes fold into the rewritten region; kept dirs still honor theirs") {
    val cat = fresh()
    cat.write(df(1 to 1000), "ns.d", WriteMode.Overwrite, statsBy = Seq("id"))
    val t = cat.table("ns.d")
    t.write(df(1001 to 2000), WriteMode.Append)
    // MOR deletes in BOTH regions
    LakeDml.delete(t, $"id".between(10L, 19L), strategy = DmlStrategy.MergeOnRead)
    LakeDml.delete(t, $"id".between(1500L, 1509L), strategy = DmlStrategy.MergeOnRead)
    t.compactWhere(Seq(LakePredicate.GtEq("id", 1001L)))
    assert(t.read().count() === 1980L)
    assert(t.read().where($"id".between(10L, 19L)).count() === 0L)
    assert(t.read().where($"id".between(1500L, 1509L)).count() === 0L)
  }

  test("declared clustering survives and applies to the rewritten dir") {
    val cat = fresh()
    cat.write(df(1 to 500).orderBy(rand(3)), "ns.c", WriteMode.Overwrite,
      sortedBy = Seq("id"))
    val t = cat.table("ns.c")
    t.write(df(501 to 1000).orderBy(rand(5)), WriteMode.Append)
    t.compactWhere(Seq(LakePredicate.GtEq("id", 400L)), targetPartitions = 4)
    assert(t.latest.get.meta.get(FileStats.SortOrderKey).contains("id"))
    assert(t.read().count() === 1000L)
    assert(t.read().agg(sum($"id")).head.getLong(0) ===
      (1L to 1000L).sum)
  }

  test("SQL: CALL compact(where => ...) scopes the rewrite") {
    val name = "cwcat"
    val wh = Files.createTempDirectory("cw-sql-").toString
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.lake.sqlcat.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    val cat = new LakeCatalog(spark, wh)
    cat.write(df(1 to 300), "ns.q", WriteMode.Overwrite, statsBy = Seq("id"))
    val t = cat.table("ns.q")
    t.write(df(301 to 600), WriteMode.Append)
    t.write(df(601 to 900), WriteMode.Append)
    val cold = t.latest.get.dirs.head
    val row = spark.sql(s"CALL $name.system.compact(table => 'ns.q', " +
      "target_partitions => 1, where => 'id >= 400')").head
    assert(row.getString(1) === "compact")
    assert(t.latest.get.dirs.contains(cold), "cold dir must survive the scoped CALL")
    assert(t.latest.get.dirs.size === 2)
    assert(spark.sql(s"SELECT count(*) FROM $name.ns.q").head.getLong(0) === 900L)
  }
}
