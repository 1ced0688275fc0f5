package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.lake.{DmlStrategy, IncrementalView, LakeCatalog, LakeDml, WriteMode}

/** Streaming maintenance of incremental materialized views: commit
  * ticks drive CAS-guarded refreshes; restarts replay as no-ops;
  * rewrites fall back to rebuild without wedging the stream.
  */
class ViewMaintenanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshCat() = {
    val cat = new LakeCatalog(spark, Files.createTempDirectory("vm-spec-").toString)
    cat.write(Seq(("a", 1L, 10.0), ("a", 2L, 20.0), ("b", 3L, 30.0))
      .toDF("g", "id", "v"), "ns.src", WriteMode.Overwrite)
    cat
  }

  private def viewRows(cat: LakeCatalog) =
    IncrementalView.read(cat, "ns.view")
      .as[(String, Long, Option[Double])].collect().toSet

  private def runOnce(cat: LakeCatalog, ckpt: String): Unit = {
    val q = ViewMaintenance.maintain(cat, "ns.src", "ns.view", Seq("g"),
      Seq("count(*) AS cnt", "sum(v) AS sum_v"), ckpt)
    q.awaitTermination()
  }

  test("AvailableNow pass builds, then maintains through appends and MOR deletes") {
    val cat = freshCat()
    val ckpt = Files.createTempDirectory("vm-ckpt-").toString
    runOnce(cat, ckpt)
    assert(viewRows(cat) === Set(("a", 2L, Some(30.0)), ("b", 1L, Some(30.0))))

    cat.write(Seq(("a", 4L, 5.0), ("c", 5L, 50.0)).toDF("g", "id", "v"),
      "ns.src", WriteMode.Append)
    LakeDml.delete(cat.table("ns.src"), $"g" === "b",
      strategy = DmlStrategy.MergeOnRead)
    runOnce(cat, ckpt)
    val snap = cat.table("ns.view").latest.get
    assert(snap.meta(IncrementalView.RefreshModeKey) === "incremental")
    assert(viewRows(cat) === Set(("a", 3L, Some(35.0)), ("c", 1L, Some(50.0))))
  }

  test("restart with a fresh checkpoint replays ticks as no-ops (CAS idempotence)") {
    val cat = freshCat()
    runOnce(cat, Files.createTempDirectory("vm-ckpt-").toString)
    val vAfter = cat.table("ns.view").latest.get.version
    // a NEW checkpoint re-delivers the whole source history as ticks;
    // refresh sees the view already reflects cur → no commit moves
    runOnce(cat, Files.createTempDirectory("vm-ckpt-").toString)
    assert(cat.table("ns.view").latest.get.version === vAfter)
    assert(viewRows(cat) === Set(("a", 2L, Some(30.0)), ("b", 1L, Some(30.0))))
  }

  test("source overwrite ticks through and rebuilds instead of wedging") {
    val cat = freshCat()
    val ckpt = Files.createTempDirectory("vm-ckpt-").toString
    runOnce(cat, ckpt)
    cat.write(Seq(("z", 9L, 90.0)).toDF("g", "id", "v"), "ns.src",
      WriteMode.Overwrite)
    runOnce(cat, ckpt)
    assert(cat.table("ns.view").latest.get
      .meta(IncrementalView.RefreshModeKey) === "full")
    assert(viewRows(cat) === Set(("z", 1L, Some(90.0))))
  }

  test("maintenance persists the definition: CALL-style refreshByName works after") {
    val cat = freshCat()
    runOnce(cat, Files.createTempDirectory("vm-ckpt-").toString)
    cat.write(Seq(("b", 6L, 3.0)).toDF("g", "id", "v"), "ns.src", WriteMode.Append)
    IncrementalView.refreshByName(cat, "ns.view") // definition came from the stream
    assert(viewRows(cat) === Set(("a", 2L, Some(30.0)), ("b", 2L, Some(33.0))))
  }
}
