package graft.lake

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class LakeDmlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable() = {
    val cat = new LakeCatalog(spark, Files.createTempDirectory("dml-spec-").toString)
    cat.write(
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("id", "name", "v"),
      "ns.t", WriteMode.Overwrite)
    cat.table("ns.t")
  }

  test("delete removes TRUE rows, keeps FALSE and NULL") {
    val t = freshTable()
    LakeDml.delete(t, $"v" > 15.0)
    assert(t.read(None).select($"id").as[Long].collect().sorted === Array(1L))
    // NULL predicate rows are kept
    val t2 = freshTable()
    LakeDml.delete(t2, when($"id" === 1L, lit(null).cast("boolean")).otherwise($"v" > 25.0))
    assert(t2.read(None).select($"id").as[Long].collect().sorted === Array(1L, 2L))
  }

  test("update rewrites matching rows only") {
    val t = freshTable()
    LakeDml.update(t, $"name" === "b", Map("v" -> lit(99.0), "name" -> lit("B")))
    val rows = t.read(None).orderBy($"id").collect()
    assert(rows.map(_.getString(1)).toSeq === Seq("a", "B", "c"))
    assert(rows.map(_.getDouble(2)).toSeq === Seq(10.0, 99.0, 30.0))
  }

  test("merge upserts: matched updated, unmatched inserted, others untouched") {
    val t = freshTable()
    val src = Seq((2L, "b2", 200.0), (9L, "new", 900.0)).toDF("id", "name", "v")
    LakeDml.merge(t, src, keys = Seq("id"))
    val rows = t.read(None).orderBy($"id").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 9L))
    assert(rows.map(_.getString(1)).toSeq === Seq("a", "b2", "c", "new"))
  }

  test("merge with explicit SET only touches listed columns") {
    val t = freshTable()
    val src = Seq((3L, "ignored", 300.0)).toDF("id", "name", "v")
    LakeDml.merge(t, src, keys = Seq("id"), set = Map("v" -> lit(-1.0)))
    val row3 = t.read(None).filter($"id" === 3L).head
    assert(row3.getString(1) === "c")    // name untouched
    assert(row3.getDouble(2) === -1.0)   // v from SET
  }

  test("merge rejects duplicate-key source") {
    val t = freshTable()
    val dup = Seq((2L, "x", 1.0), (2L, "y", 2.0)).toDF("id", "name", "v")
    intercept[IllegalArgumentException](LakeDml.merge(t, dup, keys = Seq("id")))
  }

  test("merge without insert drops unmatched source rows") {
    val t = freshTable()
    val src = Seq((2L, "b2", 200.0), (9L, "new", 900.0)).toDF("id", "name", "v")
    LakeDml.merge(t, src, keys = Seq("id"), insertNotMatched = false)
    assert(t.read(None).count() === 3)
    assert(t.read(None).filter($"id" === 2L).head.getString(1) === "b2")
  }

  test("update evaluates all SETs against the pre-update row (swap works)") {
    val t = freshTable()
    // swap name and v-as-string; also condition references a SET column
    LakeDml.update(t, $"name" === "b",
      Map("name" -> lit("B"), "v" -> lit(99.0)))
    val row = t.read(None).filter($"id" === 2L).head
    assert(row.getString(1) === "B" && row.getDouble(2) === 99.0)
    // genuine swap of two columns
    val t2 = freshTable()
    LakeDml.update(t2, lit(true), Map("id" -> ($"v".cast("long")), "v" -> ($"id".cast("double"))))
    val r = t2.read(None).orderBy($"v").collect()
    assert(r.map(_.getLong(0)).toSeq === Seq(10L, 20L, 30L))
    assert(r.map(_.getDouble(2)).toSeq === Seq(1.0, 2.0, 3.0))
  }

  test("merge accepts a subset-column source when SET covers the update") {
    val t = freshTable()
    val src = Seq((2L, -5.0), (9L, -9.0)).toDF("id", "v")   // no `name` column
    // update path: only v from SET; insert path: name null-filled
    LakeDml.merge(t, src, keys = Seq("id"), set = Map("v" -> col("_src_v")))
    val rows = t.read(None).orderBy($"id").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 9L))
    assert(rows.map(_.getDouble(2)).toSeq === Seq(10.0, -5.0, 30.0, -9.0))
    assert(rows.map(r => Option(r.getString(1))).toSeq ===
      Seq(Some("a"), Some("b"), Some("c"), None))
    // no-insert flavor with subset source also works
    val t2 = freshTable()
    LakeDml.merge(t2, src, keys = Seq("id"), set = Map("v" -> lit(0.0)),
      insertNotMatched = false)
    assert(t2.read(None).count() === 3)
    // set-less subset merge is ambiguous → clear error
    val t3 = freshTable()
    val err = intercept[RuntimeException](LakeDml.merge(t3, src, keys = Seq("id")))
    assert(err.getMessage.contains("lacks column"))
  }

  test("DML preserves hidden partition specs across rewrites") {
    import graft.lake.LakePredicate._
    val cat = new LakeCatalog(spark, Files.createTempDirectory("dml-hp-").toString)
    val df = Seq(
      (1L, "2024-01-01 10:00:00", 10.0), (2L, "2024-01-02 10:00:00", 20.0),
      (3L, "2024-01-02 11:00:00", 30.0), (4L, "2024-01-03 10:00:00", 40.0))
      .toDF("id", "s", "v").select($"id", to_timestamp($"s").as("ts"), $"v")
    cat.write(df, "ns.hp", WriteMode.Overwrite, partitionBy = Seq("days(ts)"))
    val t = cat.table("ns.hp")
    // DELETE rewrites through the spec; schema stays clean
    LakeDml.delete(t, $"id" === 4L)
    assert(t.read(None).columns.toSeq === Seq("id", "ts", "v"))
    assert(t.read(None).count() === 3)
    // UPDATE keeps partitioning live for scans
    LakeDml.update(t, $"id" === 2L, Map("v" -> lit(99.0)))
    val day2 = t.scan(Seq(
      GtEq("ts", java.sql.Timestamp.valueOf("2024-01-02 00:00:00")),
      LtEq("ts", java.sql.Timestamp.valueOf("2024-01-02 23:59:59"))))
    assert(day2.select($"v").as[Double].collect().sorted === Array(30.0, 99.0))
    day2.collect()
    assert(day2.queryExecution.executedPlan.toString.contains("_p_ts_day"))
    // MERGE on the partitioned table
    val src = Seq((3L, 333.0), (9L, 900.0)).toDF("id", "v")
    LakeDml.merge(t, src, keys = Seq("id"), set = Map("v" -> col("_src_v")))
    val after = t.read(None).orderBy($"id").collect()
    assert(after.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 9L))
    assert(after.map(_.getDouble(2)).toSeq === Seq(10.0, 99.0, 333.0, 900.0))
    assert(t.latest.get.partitionBy === Seq("days(ts)"))
  }

  test("merge pairs null-key rows instead of deleting them") {
    val cat = new LakeCatalog(spark, Files.createTempDirectory("dml-null-").toString)
    cat.write(
      Seq((Option(1L), "a"), (Option.empty[Long], "nullkey")).toDF("id", "name"),
      "ns.t", WriteMode.Overwrite)
    val t = cat.table("ns.t")
    val src = Seq((Option.empty[Long], "updated")).toDF("id", "name")
    LakeDml.merge(t, src, keys = Seq("id"), insertNotMatched = false)
    val rows = t.read(None).orderBy($"name").collect()
    // null-key target row was MATCHED (null-safe join) and updated, not dropped
    assert(rows.length === 2)
    assert(rows.map(_.getString(1)).toSeq === Seq("a", "updated"))
  }
}
