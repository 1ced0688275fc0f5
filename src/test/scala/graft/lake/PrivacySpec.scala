package graft.lake

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Erasure = COW delete + history expiry + orphan sweep + a
  * storage-level residual audit. The audit must be REAL: a
  * merge-on-read delete (bytes still in old files) has to show a
  * nonzero residual, and time travel to pre-erasure versions must be
  * gone afterwards.
  */
class PrivacySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(): LakeCatalog = new LakeCatalog(spark,
    java.nio.file.Files.createTempDirectory("privacy-").toString)

  private def seed(cat: LakeCatalog): Unit = {
    val df = (1L to 100L).map(i => (i, s"user$i", i * 10.0)).toDF("uid", "name", "score")
    cat.write(df.filter($"uid" <= 60), "ns.t", WriteMode.Overwrite)
    cat.write(df.filter($"uid" > 60), "ns.t", WriteMode.Append)
  }

  test("forget removes the subject from storage, history, and time travel") {
    val cat = fresh(); seed(cat)
    val t = cat.table("ns.t")
    val preVersions = t.history.map(_.version)
    assert(preVersions.size === 2)
    val Seq(r) = Privacy.forget(cat, Seq("ns.t" -> "uid"), (1L to 10L))
    assert(r.rowsDeleted === 10L)
    assert(r.residualRows === 0L, "no byte of the subject may remain on disk")
    assert(r.expiredSnapshots >= 2, "both pre-erasure snapshots expire")
    assert(cat.read("ns.t").count() === 90L)
    assert(cat.read("ns.t").where($"uid" <= 10).count() === 0L)
    // the pre-erasure versions are no longer readable
    preVersions.foreach { v =>
      assert(scala.util.Try(t.read(Some(v)).count()).isFailure,
        s"version $v still time-travel-readable after erasure")
    }
    // and the raw filesystem carries no matching rows either (the
    // engine's own audit re-checked independently)
    assert(Privacy.residual(t, "uid", (1L to 10L)) === 0L)
  }

  test("the residual audit detects bytes a MOR delete leaves behind") {
    val cat = fresh(); seed(cat)
    val t = cat.table("ns.t")
    // a merge-on-read delete hides the rows from reads but the bytes
    // stay in the original data files — exactly what erasure must NOT
    // count as done
    LakeDml.delete(t, $"uid".isin((1L to 10L): _*), strategy = DmlStrategy.MergeOnRead)
    assert(cat.read("ns.t").where($"uid" <= 10).count() === 0L)
    assert(Privacy.residual(t, "uid", (1L to 10L)) === 10L,
      "storage-level audit must see through the position-delete mask")
  }

  test("SQL surface: CALL graft.system.forget erases and reports the audit") {
    val name = "privcat"
    val wh = java.nio.file.Files.createTempDirectory("priv-sql-").toString
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.lake.sqlcat.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    val cat = new LakeCatalog(spark, wh)
    seed(cat)
    val row = spark.sql(s"CALL $name.system.forget(" +
      "table => 'ns.t', key_col => 'uid', keys => '3, 7, 11')").head
    assert(row.getLong(0) === 3L)   // rows_deleted
    assert(row.getLong(4) === 0L)   // residual_rows
    assert(spark.sql(s"SELECT count(*) FROM $name.ns.t WHERE uid IN (3,7,11)")
      .head.getLong(0) === 0L)
    assert(spark.sql(s"SELECT count(*) FROM $name.ns.t").head.getLong(0) === 97L)
  }

  test("retention anchors fail the request loud instead of pinning data") {
    val cat = fresh(); seed(cat)
    val t = cat.table("ns.t")
    t.createTag("audit-2024")
    val ex = intercept[IllegalArgumentException] {
      Privacy.forget(cat, Seq("ns.t" -> "uid"), Seq(1L))
    }
    assert(ex.getMessage.contains("audit-2024"))
    // after dropping the anchor the same request goes through
    t.dropTag("audit-2024")
    val Seq(r) = Privacy.forget(cat, Seq("ns.t" -> "uid"), Seq(1L))
    assert(r.rowsDeleted === 1L && r.residualRows === 0L)
  }
}
