package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.lake.{IncrementalView, LakeCatalog, WriteMode}

/** Materialized-view rewrite semantics: when it fires (exact match +
  * fresh view), what it reads (the view's files, never the base), and
  * — the load-bearing half — when it must NOT fire (stale view,
  * filtered query, unmaintained aggregate, DISTINCT), because a wrong
  * decline costs a scan while a wrong rewrite returns wrong data.
  */
class ViewRewriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val counter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Fresh catalog+SQL-catalog pair with a 2-group base table and a
    * registered count/sum/avg view over it.
    */
  private def setup(): (LakeCatalog, String) = {
    val wh = java.nio.file.Files.createTempDirectory("viewrw").toString
    val c = s"vrw${counter.incrementAndGet()}"
    spark.conf.set(s"spark.sql.catalog.$c", classOf[graft.lake.sqlcat.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$c.warehouse", wh)
    val cat = new LakeCatalog(spark, wh)
    cat.write(Seq(("a", 10L), ("a", 20L), ("b", 5L)).toDF("k", "v"),
      "base.t", WriteMode.Overwrite)
    IncrementalView.refreshSql(cat, "base.t", "mv.by_k", Seq("k"),
      Seq("count(*) as n", "sum(v) as sv", "avg(v) as av"))
    ViewRewrite.register(cat, "mv.by_k")
    (cat, c)
  }

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect(); df.queryExecution.executedPlan.toString
  }

  test("fresh view answers the matching GROUP BY; plan reads the view only") {
    val (_, c) = setup()
    val df = spark.sql(
      s"SELECT k, count(*) AS n, sum(v) AS sv, avg(v) AS av FROM $c.base.t GROUP BY k ORDER BY k")
    val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(("a", 2L, 30L, 15.0), ("b", 1L, 5L, 5.0)))
    val p = planOf(df)
    assert(p.contains("mv/by_k"), p)
    assert(!p.contains("base/t"), p)
  }

  test("stale view declines: un-refreshed append reads the base, never stale data") {
    val (cat, c) = setup()
    cat.write(Seq(("b", 100L)).toDF("k", "v"), "base.t", WriteMode.Append)
    val df = spark.sql(
      s"SELECT k, count(*) AS n, sum(v) AS sv FROM $c.base.t GROUP BY k ORDER BY k")
    val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // the new row IS in the answer — a rewrite here would have lost it
    assert(got.toSeq == Seq(("a", 2L, 30L), ("b", 2L, 105L)))
    assert(planOf(df).contains("base/t"))
    // refresh flips the same SQL back onto the view
    IncrementalView.refreshByName(cat, "mv.by_k")
    val df2 = spark.sql(
      s"SELECT k, count(*) AS n, sum(v) AS sv FROM $c.base.t GROUP BY k ORDER BY k")
    assert(df2.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      == Seq(("a", 2L, 30L), ("b", 2L, 105L)))
    assert(planOf(df2).contains("mv/by_k"))
  }

  test("shape mismatches decline to the scan: filter, unmaintained agg, distinct") {
    val (_, c) = setup()
    val filtered = spark.sql(
      s"SELECT k, count(*) AS n FROM $c.base.t WHERE v > 6 GROUP BY k ORDER BY k")
    assert(filtered.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      == Seq(("a", 2L)))
    assert(planOf(filtered).contains("base/t"))
    // min(v) is not maintained by this view
    val unmaintained = spark.sql(
      s"SELECT k, min(v) AS mn FROM $c.base.t GROUP BY k ORDER BY k")
    assert(unmaintained.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      == Seq(("a", 10L), ("b", 5L)))
    assert(planOf(unmaintained).contains("base/t"))
    // count(DISTINCT v) must never map onto the row count
    val distinct = spark.sql(
      s"SELECT k, count(DISTINCT v) AS n FROM $c.base.t GROUP BY k ORDER BY k")
    assert(distinct.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      == Seq(("a", 2L), ("b", 1L)))
    assert(planOf(distinct).contains("base/t"))
  }

  test("subset grouping rolls the view up: count/sum compose, avg declines") {
    val wh = java.nio.file.Files.createTempDirectory("viewrw").toString
    val c = s"vrw${counter.incrementAndGet()}"
    spark.conf.set(s"spark.sql.catalog.$c", classOf[graft.lake.sqlcat.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$c.warehouse", wh)
    val cat = new LakeCatalog(spark, wh)
    cat.write(Seq(("a", 1L, 10L), ("a", 1L, 20L), ("a", 2L, 40L), ("b", 1L, 5L))
      .toDF("k", "g", "v"), "base.t", WriteMode.Overwrite)
    IncrementalView.refreshSql(cat, "base.t", "mv.by_kg", Seq("k", "g"),
      Seq("count(*) as n", "sum(v) as sv", "min(v) as mn",
        "max(v) as mx", "avg(v) as av"))
    ViewRewrite.register(cat, "mv.by_kg")
    // GROUP BY k only — a strict subset of the view's (k, g) keys
    val df = spark.sql(
      s"SELECT k, count(*) AS n, sum(v) AS sv, min(v) AS mn, max(v) AS mx " +
        s"FROM $c.base.t GROUP BY k ORDER BY k")
    assert(df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
      == Seq(("a", 3L, 70L, 10L, 40L), ("b", 1L, 5L, 5L, 5L)))
    val p = planOf(df)
    assert(p.contains("mv/by_kg"), p)
    assert(!p.contains("base/t"), p)
    // avg cannot compose from the exposed view columns — whole query
    // declines to the base scan and still answers correctly
    val avgDf = spark.sql(
      s"SELECT k, avg(v) AS av FROM $c.base.t GROUP BY k ORDER BY k")
    assert(avgDf.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      == Seq(("a", 70.0 / 3.0), ("b", 5.0)))
    assert(planOf(avgDf).contains("base/t"))
  }

  test("key-only WHERE rides the rewrite; value WHERE and rand() decline") {
    val wh = java.nio.file.Files.createTempDirectory("viewrw").toString
    val c = s"vrw${counter.incrementAndGet()}"
    spark.conf.set(s"spark.sql.catalog.$c", classOf[graft.lake.sqlcat.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$c.warehouse", wh)
    val cat = new LakeCatalog(spark, wh)
    cat.write(Seq(("a", 1L, 10L), ("a", 2L, 20L), ("b", 1L, 5L), ("c", 9L, 7L))
      .toDF("k", "g", "v"), "base.t", WriteMode.Overwrite)
    IncrementalView.refreshSql(cat, "base.t", "mv.by_kg", Seq("k", "g"),
      Seq("count(*) as n", "sum(v) as sv"))
    ViewRewrite.register(cat, "mv.by_kg")
    // predicate on k (a view key the query also groups by) — whole
    // view groups match or don't, so the view answers the filtered
    // rollup exactly
    val onGrouped = spark.sql(
      s"SELECT k, count(*) AS n, sum(v) AS sv FROM $c.base.t " +
        "WHERE k <> 'c' GROUP BY k ORDER BY k")
    assert(onGrouped.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      == Seq(("a", 2L, 30L), ("b", 1L, 5L)))
    val p1 = planOf(onGrouped)
    assert(p1.contains("mv/by_kg"), p1)
    assert(!p1.contains("base/t"), p1)
    // predicate on g — a view key the query does NOT group by: still
    // partitions whole (k, g) view groups, so the subset rollup is
    // exact over the filtered view rows
    val onUngrouped = spark.sql(
      s"SELECT k, sum(v) AS sv FROM $c.base.t WHERE g = 1 GROUP BY k ORDER BY k")
    assert(onUngrouped.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      == Seq(("a", 10L), ("b", 5L)))
    val p2 = planOf(onUngrouped)
    assert(p2.contains("mv/by_kg"), p2)
    assert(!p2.contains("base/t"), p2)
    // predicate on the measure column v — the view collapsed the rows
    // it would need to see; must decline to the scan
    val onValue = spark.sql(
      s"SELECT k, count(*) AS n FROM $c.base.t WHERE v >= 10 GROUP BY k ORDER BY k")
    assert(onValue.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      == Seq(("a", 2L)))
    assert(planOf(onValue).contains("base/t"))
    // nondeterministic predicate on a key column — must decline
    val nondet = spark.sql(
      s"SELECT k, count(*) AS n FROM $c.base.t WHERE k < 'z' AND rand() <= 1.0 " +
        "GROUP BY k ORDER BY k")
    assert(nondet.collect().length == 3)
    assert(planOf(nondet).contains("base/t"))
  }

  test("time travel declines: a version-pinned read must not see today's view") {
    val (cat, c) = setup()
    val v1 = cat.table("base.t").latest.get.version
    cat.write(Seq(("a", 1000L)).toDF("k", "v"), "base.t", WriteMode.Append)
    IncrementalView.refreshByName(cat, "mv.by_k")
    // pinned at v1: the old counts, off the base's v1 files
    val pinned = spark.sql(
      s"SELECT k, count(*) AS n, sum(v) AS sv FROM $c.base.t VERSION AS OF $v1 " +
        "GROUP BY k ORDER BY k")
    assert(pinned.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      == Seq(("a", 2L, 30L), ("b", 1L, 5L)))
    // current read rides the (fresh) view
    val cur = spark.sql(
      s"SELECT k, count(*) AS n, sum(v) AS sv FROM $c.base.t GROUP BY k ORDER BY k")
    assert(cur.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      == Seq(("a", 3L, 1030L), ("b", 1L, 5L)))
    assert(planOf(cur).contains("mv/by_k"))
  }
}
