package graft.lake

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Tags (named immutable snapshot refs) and write-audit-publish
  * staged commits.
  */
class LakeRefsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh() = {
    val cat = new LakeCatalog(spark, Files.createTempDirectory("refs-spec-").toString)
    cat.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), "ns.t", WriteMode.Overwrite)
    cat.table("ns.t")
  }

  test("tag pins a version; readTag time-travels; duplicate tag fails") {
    val t = fresh()
    val v1 = t.createTag("release-1")
    t.write(Seq((3L, "c")).toDF("id", "s"), WriteMode.Append)
    assert(t.readTag("release-1").count() === 2)
    assert(t.read(None).count() === 3)
    assert(t.tagVersion("release-1") === Some(v1))
    assert(t.tags === Seq("release-1" -> v1))
    intercept[IllegalArgumentException](t.createTag("release-1"))
    intercept[IllegalArgumentException](t.createTag("bad/name"))
  }

  test("expiry flows around tagged snapshots until the tag drops") {
    val t = fresh()
    t.createTag("keep")
    t.write(Seq((3L, "c")).toDF("id", "s"), WriteMode.Append)
    t.write(Seq((4L, "d")).toDF("id", "s"), WriteMode.Append)
    val (gone1, _) = t.expireSnapshots(1)
    assert(gone1 === 1) // v2 expired; v1 is tagged, v3 latest
    assert(t.readTag("keep").count() === 2)
    t.dropTag("keep")
    val (gone2, _) = t.expireSnapshots(1)
    assert(gone2 === 1) // v1 now expirable
    assert(t.tagVersion("keep") === None)
  }

  test("write-audit-publish: staged rows invisible until publish") {
    val t = fresh()
    val id = t.stageAppend(Seq((3L, "c"), (4L, "d")).toDF("id", "s"))
    // no reader sees staged data; history has no new version
    assert(t.read(None).count() === 2)
    assert(t.history.size === 1)
    // audit sees table-as-if-published
    assert(t.readStaged(id).count() === 4)
    val snap = t.publishStaged(id)
    assert(snap.op === "append" && t.read(None).count() === 4)
    // staged manifest consumed
    intercept[IllegalArgumentException](t.readStaged(id))
  }

  test("discarded staged commit disappears; orphan sweep spares live staged dirs") {
    val t = fresh()
    val id1 = t.stageAppend(Seq((5L, "e")).toDF("id", "s"))
    val id2 = t.stageAppend(Seq((6L, "f")).toDF("id", "s"))
    t.discardStaged(id2)
    intercept[IllegalArgumentException](t.readStaged(id2))
    // a zero-grace orphan sweep must NOT reclaim id1's staged dir
    t.removeOrphanFiles(graceMs = 0)
    assert(t.readStaged(id1).count() === 3)
    t.publishStaged(id1)
    assert(t.read(None).count() === 3)
  }

  test("stagedCommits lists pending WAP commits until publish/discard") {
    val t = fresh()
    assert(t.stagedCommits.count() === 0)
    val id1 = t.stageAppend(Seq((3L, "c")).toDF("id", "s"))
    val id2 = t.stageAppend(Seq((4L, "d")).toDF("id", "s"))
    val listed = t.stagedCommits.collect().map(_.getString(0)).toSet
    assert(listed === Set(id1, id2))
    t.publishStaged(id1)
    t.discardStaged(id2)
    assert(t.stagedCommits.count() === 0)
  }

  test("publish fails if the schema evolved since staging; staged commit survives") {
    val t = fresh()
    val id = t.stageAppend(Seq((3L, "c")).toDF("id", "s"))
    t.renameColumn("s", "label")
    val e = intercept[IllegalArgumentException](t.publishStaged(id))
    assert(e.getMessage.contains("schema changed"))
    t.discardStaged(id)
  }

  test("branch writes are invisible on main; fast-forward publishes atomically") {
    val t = fresh()
    val base = t.createBranch("audit")
    assert(base === 1L)
    // multiple validation writes on the branch — the surface staged
    // single commits cannot cover
    t.writeBranch("audit", Seq((3L, "c")).toDF("id", "s"), WriteMode.Append)
    t.writeBranch("audit", Seq((4L, "d")).toDF("id", "s"), WriteMode.Append)
    assert(t.read(None).count() === 2)                   // main untouched
    assert(t.readBranch("audit").count() === 4)          // branch sees both
    assert(t.branches === Seq(("audit", 1L, 3L)))
    val snap = t.fastForward("audit")
    assert(snap.op === "fast-forward")
    assert(t.read(None).count() === 4)                   // atomically visible
    assert(t.branchBase("audit") === None)               // branch consumed
    assert(t.history.map(_.version) === Seq(1L, 2L))     // ONE main commit
  }

  test("fast-forward refuses when main moved; dropBranch abandons cleanly") {
    val t = fresh()
    t.createBranch("audit")
    t.writeBranch("audit", Seq((3L, "c")).toDF("id", "s"), WriteMode.Append)
    t.write(Seq((9L, "z")).toDF("id", "s"), WriteMode.Append) // main advances
    intercept[java.util.ConcurrentModificationException](t.fastForward("audit"))
    assert(t.dropBranch("audit"))
    assert(t.branchHead("audit").isEmpty)
    assert(t.read(None).count() === 3)
  }

  test("expiry and orphan sweep respect branch liveness") {
    val t = fresh()
    t.write(Seq((3L, "c")).toDF("id", "s"), WriteMode.Append) // v2
    t.createBranch("keep", Some(1L))                          // branch pins v1's dirs
    t.write(Seq((4L, "d")).toDF("id", "s"), WriteMode.Append) // v3
    t.expireSnapshots(1)                                      // v1, v2 manifests expire
    // v1's dirs survive: the branch references them
    assert(t.readBranch("keep").count() === 2)
    assert(t.removeOrphanFiles(graceMs = 0L) === 0)           // nothing falsely orphaned
    // branch-minted dirs become orphans only after the branch drops
    t.writeBranch("keep", Seq((5L, "e")).toDF("id", "s"), WriteMode.Append)
    t.dropBranch("keep")
    assert(t.removeOrphanFiles(graceMs = 0L) >= 1)
    assert(t.read(None).count() === 4)                        // main unharmed
  }

  test("tag and branch names share the ref namespace; tags list excludes branches") {
    val t = fresh()
    t.createBranch("wap")
    intercept[IllegalArgumentException](t.createTag("wap"))
    t.createTag("rel")
    assert(t.tags.map(_._1) === Seq("rel"))
    assert(t.branches.map(_._1) === Seq("wap"))
    assert(t.tagVersion("wap") === None)
  }

  test("SQL VERSION AS OF reads a branch head") {
    val wh = Files.createTempDirectory("refs-sql-").toString
    val c = "grefsql1"
    spark.conf.set(s"spark.sql.catalog.$c", classOf[graft.lake.sqlcat.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$c.warehouse", wh)
    val cat = new LakeCatalog(spark, wh)
    cat.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), "ns.t", WriteMode.Overwrite)
    val t = cat.table("ns.t")
    t.createBranch("audit")
    t.writeBranch("audit", Seq((3L, "c")).toDF("id", "s"), WriteMode.Append)
    val got = spark.sql(s"SELECT id FROM $c.ns.t VERSION AS OF 'audit' ORDER BY id")
      .as[Long].collect()
    assert(got === Array(1L, 2L, 3L))
    assert(spark.sql(s"SELECT id FROM $c.ns.t").count() === 2)
  }

  test("branch DML via merge-on-read machinery stays off main") {
    val t = fresh()
    t.createBranch("fix")
    // overwrite ON the branch (full rewrite semantics against branch head)
    t.writeBranch("fix", Seq((1L, "A"), (2L, "B")).toDF("id", "s"), WriteMode.Overwrite)
    assert(t.readBranch("fix").select("s").as[String].collect().sorted === Array("A", "B"))
    assert(t.read(None).select("s").as[String].collect().sorted === Array("a", "b"))
    t.fastForward("fix")
    assert(t.read(None).select("s").as[String].collect().sorted === Array("A", "B"))
  }

  test("a dropped-and-recreated branch never serves stale cached lineage") {
    // the one path-reuse case in the write-once manifest scheme: drop
    // a branch, recreate it, and commit again — the new manifest lands
    // at a PATH an older (deleted) manifest once occupied, and the
    // parsed-manifest cache must not serve the dead version
    val t = fresh()
    t.createBranch("b")
    t.writeBranch("b", Seq((3L, "old")).toDF("id", "s"), WriteMode.Append)
    assert(t.readBranch("b").count() === 3)
    t.dropBranch("b")
    Thread.sleep(5) // distinct mtime for the re-minted path
    t.createBranch("b")
    t.writeBranch("b", Seq((4L, "new1")).toDF("id", "s"), WriteMode.Append)
    t.writeBranch("b", Seq((5L, "new2")).toDF("id", "s"), WriteMode.Append)
    val got = t.readBranch("b").select("s").as[String].collect().sorted
    assert(got === Array("a", "b", "new1", "new2"), got.mkString(","))
  }

  test("staged appends respect hidden partition specs at publish") {
    val cat = new LakeCatalog(spark, Files.createTempDirectory("refs-spec-").toString)
    val df = spark.range(0, 10).select($"id",
      org.apache.spark.sql.functions.to_timestamp(
        org.apache.spark.sql.functions.lit("2026-02-01 00:00:00")).as("ts"))
    cat.table("ns.p").write(df, WriteMode.Overwrite, partitionBy = Seq("days(ts)"))
    val t = cat.table("ns.p")
    val id = t.stageAppend(spark.range(10, 15).select($"id",
      org.apache.spark.sql.functions.to_timestamp(
        org.apache.spark.sql.functions.lit("2026-02-02 00:00:00")).as("ts")))
    t.publishStaged(id)
    assert(t.read(None).count() === 15)
    assert(t.latest.get.partitionBy === Seq("days(ts)"))
  }
}
