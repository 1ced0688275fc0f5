package graft.lake

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Version-range changelog reads (Iceberg changelog scan / Delta CDF
  * shape): row-level inserts/deletes derived from manifest diffs, with
  * positional and equality delete files materialized against the
  * prior snapshot.
  */
class LakeChangesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh() = {
    val cat = new LakeCatalog(spark, Files.createTempDirectory("chg-spec-").toString)
    cat.write(Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("id", "name", "v"),
      "ns.t", WriteMode.Overwrite)
    cat.table("ns.t")
  }

  private def changes(t: LakeTable, from: Long, to: Option[Long] = None,
                      skip: Boolean = false) =
    t.readChanges(from, to, skip).orderBy($"_commit_version", $"_change_type", $"id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getString(3), r.getLong(4))).toSeq

  test("appends produce inserts at their commit versions") {
    val t = fresh()
    t.write(Seq((4L, "d", 40.0)).toDF("id", "name", "v"), WriteMode.Append)
    t.write(Seq((5L, "e", 50.0)).toDF("id", "name", "v"), WriteMode.Append)
    assert(changes(t, 1) === Seq(
      (4L, "d", 40.0, "insert", 2L),
      (5L, "e", 50.0, "insert", 3L)))
    // full-range read includes the initial overwrite's rows as inserts
    assert(changes(t, 0).count(_._4 == "insert") === 5)
    // empty range
    assert(changes(t, 3) === Seq())
  }

  test("MOR delete emits the deleted rows' prior values") {
    val t = fresh()
    LakeDml.delete(t, $"id" === 2L, strategy = DmlStrategy.MergeOnRead)
    assert(changes(t, 1) === Seq((2L, "b", 20.0, "delete", 2L)))
  }

  test("MOR update is delete+insert at one version") {
    val t = fresh()
    LakeDml.update(t, $"id" === 3L, Map("v" -> lit(99.0)),
      strategy = DmlStrategy.MergeOnRead)
    assert(changes(t, 1) === Seq(
      (3L, "c", 30.0, "delete", 2L),
      (3L, "c", 99.0, "insert", 2L)))
  }

  test("upsert emits deletes of retired key versions plus its inserts") {
    val t = fresh()
    t.upsert(Seq((2L, "b2", 200.0), (9L, "new", 900.0)).toDF("id", "name", "v"), Seq("id"))
    assert(changes(t, 1) === Seq(
      (2L, "b", 20.0, "delete", 2L),
      (2L, "b2", 200.0, "insert", 2L),
      (9L, "new", 900.0, "insert", 2L)))
    // a second upsert of the same key deletes the FIRST upsert's row
    t.upsert(Seq((2L, "b3", 300.0)).toDF("id", "name", "v"), Seq("id"))
    assert(changes(t, 2) === Seq(
      (2L, "b2", 200.0, "delete", 3L),
      (2L, "b3", 300.0, "insert", 3L)))
  }

  test("compaction and delete-file rewrites are passed over silently") {
    val t = fresh()
    t.upsert(Seq((2L, "b2", 200.0)).toDF("id", "name", "v"), Seq("id"))
    LakeDml.delete(t, $"id" === 1L, strategy = DmlStrategy.MergeOnRead)
    LakeDml.delete(t, $"id" === 3L, strategy = DmlStrategy.MergeOnRead)
    t.rewritePositionDeletes()
    val pre = changes(t, 1, Some(4))
    t.compact(1)
    // the fold moves no logical rows: same changelog, no failure
    assert(changes(t, 1) === pre)
    // and nothing after the compact version
    assert(changes(t, t.latest.get.version) === Seq())
  }

  test("rewriting commits fail loud; skipRewrites passes over them") {
    val t = fresh()
    t.write(Seq((4L, "d", 40.0)).toDF("id", "name", "v"), WriteMode.Append)
    t.write(Seq((9L, "z", 0.0)).toDF("id", "name", "v"), WriteMode.Overwrite)
    t.write(Seq((5L, "e", 50.0)).toDF("id", "name", "v"), WriteMode.Append)
    val e = intercept[RewriteCommitException](t.readChanges(1))
    assert(e.version === 3L)
    assert(changes(t, 1, skip = true) === Seq(
      (4L, "d", 40.0, "insert", 2L),
      (5L, "e", 50.0, "insert", 4L)))
  }

  test("changelog aligns schema generations (rename mid-range)") {
    val t = fresh()
    t.write(Seq((4L, "d", 40.0)).toDF("id", "name", "v"), WriteMode.Append)
    t.renameColumn("name", "label")
    t.write(Seq((5L, "e", 50.0)).toDF("id", "label", "v"), WriteMode.Append)
    val got = t.readChanges(1).orderBy($"_commit_version")
    assert(got.columns.toSeq === Seq("id", "label", "v", "_change_type", "_commit_version"))
    assert(got.select($"label").as[String].collect().sorted === Array("d", "e"))
  }

  test("schema evolves AFTER a delete commit in the range: prior-snapshot frames align") {
    // MOR delete at v2, rename + add-column at v3/v4, then an append:
    // the delete materialization reads the v1 snapshot, which must
    // align by field id to the CURRENT schema (renamed values survive,
    // added columns null-fill) instead of throwing on the select
    val t = fresh()
    LakeDml.delete(t, $"id" === 2L, strategy = DmlStrategy.MergeOnRead) // v2
    t.renameColumn("name", "label")                                     // v3
    t.addColumn("extra", org.apache.spark.sql.types.DoubleType)         // v4
    t.write(Seq((6L, "f", 60.0, 1.5)).toDF("id", "label", "v", "extra"),
      WriteMode.Append)                                                 // v5
    val got = t.readChanges(1).orderBy($"_commit_version", $"id")
    assert(got.columns.toSeq ===
      Seq("id", "label", "v", "extra", "_change_type", "_commit_version"))
    val del = got.filter($"_change_type" === "delete").collect()
    assert(del.map(_.getLong(0)).toSeq === Seq(2L))
    assert(del.head.getString(1) === "b")   // renamed column's value survives
    assert(del.head.isNullAt(3))            // added column null-fills
    assert(got.filter($"_change_type" === "insert").select($"id").as[Long]
      .collect().sorted === Array(6L))
  }

  test("upsert changelog with null keys still emits the null-safe delete") {
    // footer-range pushdown must not prune away null-key matches: a
    // column the batch holds nulls in contributes no bound
    val cat = new LakeCatalog(spark, Files.createTempDirectory("chg-null-").toString)
    cat.write(Seq((Some(1L), "a", 10.0), (Option.empty[Long], "n", -1.0))
      .toDF("id", "name", "v"), "ns.t", WriteMode.Overwrite)
    val t = cat.table("ns.t")
    t.upsert(Seq((Option.empty[Long], "n2", -2.0)).toDF("id", "name", "v"), Seq("id"))
    val got = t.readChanges(1).orderBy($"_change_type")
      .select($"name", $"_change_type").collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq === Seq(("n", "delete"), ("n2", "insert")))
  }

  test("upsert key columns containing the manifest delimiters are rejected") {
    val cat = new LakeCatalog(spark, Files.createTempDirectory("chg-bad-").toString)
    cat.write(Seq((1L, "a")).toDF("id", "x|y"), "ns.t", WriteMode.Overwrite)
    val t = cat.table("ns.t")
    intercept[IllegalArgumentException](
      t.upsert(Seq((2L, "b")).toDF("id", "x|y"), Seq("x|y")))
  }
}
