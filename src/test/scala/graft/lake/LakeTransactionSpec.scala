package graft.lake

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Multi-statement transactions: staged-overwrite building block,
  * all-or-nothing multi-table publish, conflict abort + rollback.
  */
class LakeTransactionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshCat() = {
    val cat = new LakeCatalog(spark, Files.createTempDirectory("txn-spec-").toString)
    cat.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), "ns.bronze", WriteMode.Overwrite)
    cat.write(Seq((1L, "A")).toDF("id", "s"), "ns.silver", WriteMode.Overwrite)
    cat.write(Seq((0L, 0L)).toDF("k", "n"), "ns.gold", WriteMode.Overwrite)
    cat
  }

  test("staged overwrite: invisible until publish, then REPLACES the table") {
    val cat = freshCat()
    val t = cat.table("ns.bronze")
    val id = t.stageWrite(Seq((9L, "z")).toDF("id", "s"), WriteMode.Overwrite)
    assert(t.read(None).count() === 2)           // still the old rows
    assert(t.readStaged(id).count() === 1)       // audit view = replacement only
    val snap = t.publishStaged(id)
    assert(snap.op === "overwrite")
    assert(t.read(None).as[(Long, String)].collect().toSet === Set((9L, "z")))
  }

  test("staged overwrite keeps bloom/sort/stats table properties") {
    val cat = freshCat()
    cat.write(spark.range(100).select($"id", ($"id" % 7).as("g")), "ns.sorted",
      WriteMode.Overwrite, sortedBy = Seq("id"), bloomBy = Seq("g"))
    val t = cat.table("ns.sorted")
    val id = t.stageWrite(spark.range(100, 200).select($"id", ($"id" % 7).as("g")),
      WriteMode.Overwrite)
    val snap = t.publishStaged(id)
    assert(snap.meta.get(FileStats.SortOrderKey).contains("id"))
    assert(snap.meta.get(FileStats.BloomColsKey).contains("g"))
  }

  test("transaction publishes all tables; readers see nothing before commit") {
    val cat = freshCat()
    val txn = cat.transaction()
      .write(Seq((3L, "c")).toDF("id", "s"), "ns.bronze")
      .write(Seq((3L, "C")).toDF("id", "s"), "ns.silver")
      .write(Seq((1L, 3L)).toDF("k", "n"), "ns.gold", WriteMode.Overwrite)
    // staged, not visible
    assert(cat.read("ns.bronze").count() === 2)
    assert(cat.read("ns.silver").count() === 1)
    assert(cat.read("ns.gold").as[(Long, Long)].collect().toSet === Set((0L, 0L)))
    val snaps = txn.commit()
    assert(snaps.keySet === Set("ns.bronze", "ns.silver", "ns.gold"))
    assert(cat.read("ns.bronze").count() === 3)
    assert(cat.read("ns.silver").count() === 2)
    assert(cat.read("ns.gold").as[(Long, Long)].collect().toSet === Set((1L, 3L)))
  }

  test("two writes to one table in a txn publish in order") {
    val cat = freshCat()
    val snaps = cat.transaction()
      .write(Seq((3L, "c")).toDF("id", "s"), "ns.bronze")
      .write(Seq((4L, "d")).toDF("id", "s"), "ns.bronze")
      .commit()
    assert(cat.read("ns.bronze").count() === 4)
    assert(snaps("ns.bronze").version === cat.table("ns.bronze").latest.get.version)
  }

  test("concurrent commit aborts the txn and rolls back published tables") {
    val cat = freshCat()
    val txn = cat.transaction()
      .write(Seq((3L, "c")).toDF("id", "s"), "ns.bronze")
      .write(Seq((3L, "C")).toDF("id", "s"), "ns.silver")
    // interloper moves silver AFTER staging, BEFORE commit
    cat.write(Seq((7L, "X")).toDF("id", "s"), "ns.silver", WriteMode.Append)
    val preBronze = cat.table("ns.bronze").latest.get.version
    intercept[java.util.ConcurrentModificationException](txn.commit())
    // bronze (published first) was rolled back; silver kept the
    // interloper's row and nothing of ours
    assert(cat.read("ns.bronze").count() === 2)
    assert(cat.read("ns.silver").as[(Long, String)].collect().toSet ===
      Set((1L, "A"), (7L, "X")))
    // rollback is a NEW version (history immutable), state matches preBronze
    val t = cat.table("ns.bronze")
    assert(t.latest.get.version > preBronze)
    assert(t.read(Some(preBronze)).count() === 2)
    // txn is closed
    intercept[IllegalArgumentException](txn.commit())
  }

  test("abort discards all staged data; no versions move") {
    val cat = freshCat()
    val vb = cat.table("ns.bronze").latest.get.version
    val txn = cat.transaction()
      .write(Seq((3L, "c")).toDF("id", "s"), "ns.bronze")
      .write(Seq((9L, 9L)).toDF("k", "n"), "ns.gold", WriteMode.Overwrite)
    txn.abort()
    assert(cat.table("ns.bronze").latest.get.version === vb)
    assert(cat.read("ns.gold").as[(Long, Long)].collect().toSet === Set((0L, 0L)))
    // staged manifests gone: orphan sweep has nothing live to spare
    assert(cat.table("ns.bronze").stagedCommits.count() === 0)
    intercept[IllegalArgumentException](txn.write(
      Seq((1L, "x")).toDF("id", "s"), "ns.bronze"))
  }

  test("transaction write to a missing table fails fast, nothing staged") {
    val cat = freshCat()
    intercept[IllegalStateException](cat.transaction()
      .write(Seq((1L, "x")).toDF("id", "s"), "ns.nope"))
  }
}
