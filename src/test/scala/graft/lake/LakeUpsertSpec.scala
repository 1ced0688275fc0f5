package graft.lake

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Equality-delete upserts (Iceberg v2 equality delete files): the
  * streaming/CDC ingest write shape — each batch appends data plus a
  * key-valued delete file retiring OLDER rows, never reading the
  * table.
  */
class LakeUpsertSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh() = {
    val cat = new LakeCatalog(spark, Files.createTempDirectory("upsert-spec-").toString)
    cat.write(
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("id", "name", "v"),
      "ns.t", WriteMode.Overwrite)
    cat.table("ns.t")
  }

  private def byId(t: LakeTable) =
    t.read(None).orderBy($"id").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq

  test("upsert replaces matching keys, inserts new ones, keeps the rest") {
    val t = fresh()
    t.upsert(Seq((2L, "b2", 200.0), (9L, "new", 900.0)).toDF("id", "name", "v"), Seq("id"))
    assert(byId(t) === Seq((1L, "a", 10.0), (2L, "b2", 200.0), (3L, "c", 30.0), (9L, "new", 900.0)))
  }

  test("upsert does not read or rewrite existing data files") {
    val t = fresh()
    val before = t.latest.get
    t.upsert(Seq((2L, "b2", 200.0)).toDF("id", "name", "v"), Seq("id"))
    val after = t.latest.get
    // prior data dirs are carried untouched; one new data dir + one eq delete
    assert(after.dirs.take(before.dirs.size) === before.dirs)
    assert(after.dirs.size === before.dirs.size + 1)
    assert(after.eqDeletes.size === 1)
    assert(after.op === "upsert")
    // delete file is key values only — a handful of bytes, not a rewrite
    val e = EqDelete.decode(after.eqDeletes.head)
    assert(e.cols === Seq("id"))
    assert(e.seq === after.version)
  }

  test("sequence semantics: later appends with a deleted key survive") {
    val t = fresh()
    t.upsert(Seq((2L, "b2", 200.0)).toDF("id", "name", "v"), Seq("id"))
    // a plain append AFTER the upsert re-introduces id=2: the delete's
    // sequence is older, so the appended row must survive
    t.write(Seq((2L, "b3", 300.0)).toDF("id", "name", "v"), WriteMode.Append)
    val rows = byId(t).filter(_._1 == 2L)
    assert(rows.toSet === Set((2L, "b2", 200.0), (2L, "b3", 300.0)))
  }

  test("chained upserts: last writer wins per key") {
    val t = fresh()
    t.upsert(Seq((1L, "a1", 11.0), (4L, "d", 40.0)).toDF("id", "name", "v"), Seq("id"))
    t.upsert(Seq((1L, "a2", 12.0), (2L, "b1", 21.0)).toDF("id", "name", "v"), Seq("id"))
    assert(byId(t) === Seq((1L, "a2", 12.0), (2L, "b1", 21.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("multi-column keys match null-safely") {
    val cat = new LakeCatalog(spark, Files.createTempDirectory("upsert-spec-").toString)
    val df = Seq((1L, Some("x"), 1.0), (1L, None, 2.0), (2L, Some("x"), 3.0))
      .toDF("k1", "k2", "v")
    cat.write(df, "ns.t", WriteMode.Overwrite)
    val t = cat.table("ns.t")
    // (1, NULL) must match the existing null-keyed row (IS NOT DISTINCT FROM)
    t.upsert(Seq((1L, Option.empty[String], 20.0)).toDF("k1", "k2", "v"), Seq("k1", "k2"))
    val rows = t.read(None).orderBy($"k1", $"k2").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getDouble(2))).toSeq
    assert(rows === Seq((1L, None, 20.0), (1L, Some("x"), 1.0), (2L, Some("x"), 3.0)))
  }

  test("upsert into an empty table is a plain write") {
    val cat = new LakeCatalog(spark, Files.createTempDirectory("upsert-spec-").toString)
    val t = cat.table("ns.t")
    t.upsert(Seq((1L, "a", 1.0)).toDF("id", "name", "v"), Seq("id"))
    assert(byId(t) === Seq((1L, "a", 1.0)))
  }

  test("time travel to a pre-upsert version sees the original rows") {
    val t = fresh()
    val v1 = t.latest.get.version
    t.upsert(Seq((2L, "b2", 200.0)).toDF("id", "name", "v"), Seq("id"))
    assert(t.read(Some(v1)).orderBy($"id").collect().map(_.getString(1)).toSeq
      === Seq("a", "b", "c"))
  }

  test("compact folds equality deletes into data") {
    val t = fresh()
    t.upsert(Seq((2L, "b2", 200.0)).toDF("id", "name", "v"), Seq("id"))
    val snap = t.compact(1)
    assert(snap.eqDeletes.isEmpty)
    assert(snap.deleteDirs.isEmpty)
    assert(byId(t) === Seq((1L, "a", 10.0), (2L, "b2", 200.0), (3L, "c", 30.0)))
  }

  test("upserts compose with positional (MOR) deletes") {
    val t = fresh()
    LakeDml.delete(t, $"id" === 3L, strategy = DmlStrategy.MergeOnRead)
    t.upsert(Seq((2L, "b2", 200.0)).toDF("id", "name", "v"), Seq("id"))
    assert(byId(t) === Seq((1L, "a", 10.0), (2L, "b2", 200.0)))
  }

  test("rollback restores exact upsert state, expiry keeps live delete dirs") {
    val t = fresh()
    t.upsert(Seq((2L, "b2", 200.0)).toDF("id", "name", "v"), Seq("id"))
    val v2 = t.latest.get.version
    t.write(Seq((7L, "g", 70.0)).toDF("id", "name", "v"), WriteMode.Append)
    t.rollbackTo(v2)
    val rolled = t.latest.get
    assert(rolled.eqDeletes === t.snapshotAt(v2).get.eqDeletes)
    assert(rolled.dirSeqs === t.snapshotAt(v2).get.dirSeqs)
    assert(byId(t) === Seq((1L, "a", 10.0), (2L, "b2", 200.0), (3L, "c", 30.0)))
    // expire everything but the rollback: eq delete dir stays live
    t.expireSnapshots(1)
    assert(byId(t) === Seq((1L, "a", 10.0), (2L, "b2", 200.0), (3L, "c", 30.0)))
  }

  test("rename/drop of an eq-delete key column fails loud; compact unblocks") {
    val t = fresh()
    t.upsert(Seq((2L, "b2", 200.0)).toDF("id", "name", "v"), Seq("id"))
    val e1 = intercept[IllegalArgumentException](t.renameColumn("id", "id2"))
    assert(e1.getMessage.contains("equality delete"))
    val e2 = intercept[IllegalArgumentException](t.dropColumn("id"))
    assert(e2.getMessage.contains("equality delete"))
    // non-key columns evolve freely
    t.renameColumn("name", "label")
    t.compact(1)
    t.renameColumn("id", "id2") // unblocked after the fold
    assert(t.read(None).columns.toSeq === Seq("id2", "label", "v"))
  }

  test("concurrent upserts both land (claim race rebases)") {
    val t = fresh()
    val threads = (1 to 4).map { i =>
      new Thread(() => {
        val df = Seq((i.toLong * 100, s"t$i", i.toDouble)).toDF("id", "name", "v")
        t.upsert(df, Seq("id"))
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val snap = t.latest.get
    assert(snap.eqDeletes.size === 4)
    assert(t.read(None).count() === 7) // 3 originals + 4 distinct new keys
  }

  test("rewriteEqualityDeletes folds trickle commits; sequences survive bit-exact") {
    val t = fresh()
    t.upsert(Seq((1L, "a1", 11.0)).toDF("id", "name", "v"), Seq("id"))
    // an append BETWEEN upserts: its id=1 row must outlive the FIRST
    // upsert's delete (older seq) but die to the SECOND's — folding
    // must preserve exactly that
    t.write(Seq((1L, "mid", 0.0)).toDF("id", "name", "v"), WriteMode.Append)
    t.upsert(Seq((2L, "b1", 21.0)).toDF("id", "name", "v"), Seq("id"))
    t.upsert(Seq((1L, "a2", 12.0)).toDF("id", "name", "v"), Seq("id"))
    val before = byId(t)
    assert(t.latest.get.eqDeletes.size === 3)
    val snap = t.rewriteEqualityDeletes()
    assert(snap.eqDeletes.size === 1)
    assert(EqDelete.decode(snap.eqDeletes.head).seq === EqDelete.PerRowSeq)
    assert(byId(t) === before)
    assert(before.filter(_._1 == 1L).map(_._2).toSet === Set("a2"))
    // the "mid" append row died to the later upsert; a1 died too
    // post-fold upserts keep composing
    t.upsert(Seq((3L, "c1", 31.0)).toDF("id", "name", "v"), Seq("id"))
    assert(byId(t).filter(_._1 == 3L).map(_._2) === Seq("c1"))
    // maintenance commit is metadata-safe for append feeds
    assert(snap.op === "rewrite-deletes")
  }

  test("binpack compaction folds only small dirs; deletes and upserts keep composing") {
    val cat = new LakeCatalog(spark, Files.createTempDirectory("binpack-").toString)
    // one BIG commit, then trickle commits
    cat.write(spark.range(0, 300000).select($"id", ($"id" % 9).cast("double").as("v")),
      "ns.t", WriteMode.Overwrite)
    val t = cat.table("ns.t")
    val bigDir = t.latest.get.dirs.head
    for (i <- 1 to 4)
      t.write(spark.range(400000L + i, 400001L + i).select($"id", lit(0.0).as("v")),
        WriteMode.Append)
    // MOR delete hitting both big and small dirs, plus an upsert
    LakeDml.delete(t, $"id" === 7L || $"id" === 400002L, strategy = DmlStrategy.MergeOnRead)
    t.upsert(spark.range(400003L, 400004L).select($"id", lit(99.0).as("v")), Seq("id"))
    val before = t.read(None).orderBy($"id").collect().toSeq
    val snap = t.compactBinPack(maxDirBytes = 256 * 1024)
    // the big dir is carried untouched; the trickle dirs fold into one
    assert(snap.dirs.contains(bigDir))
    assert(snap.dirs.size === 2, snap.dirs.mkString(","))
    assert(t.read(None).orderBy($"id").collect().toSeq === before)
    // deletes still bind: id=7 (big dir, positional) stays dead, and a
    // LATER upsert retires a row that was just rewritten
    t.upsert(spark.range(400004L, 400005L).select($"id", lit(-1.0).as("v")), Seq("id"))
    val live = t.read(None).where($"id" >= 400000L).orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(live === Seq((400001L, 0.0), (400003L, 99.0), (400004L, -1.0)))
    assert(t.read(None).where($"id" === 7L).count() === 0)
  }

  test("upsert on a hidden-partitioned table prunes and matches") {
    val cat = new LakeCatalog(spark, Files.createTempDirectory("upsert-spec-").toString)
    val df = spark.range(0, 100).select(
      $"id",
      to_timestamp(lit("2026-01-01 00:00:00")).plus(expr("make_interval(0,0,0,id,0,0,0)")).as("ts"),
      ($"id" * 1.0).as("v"))
    cat.table("ns.p").write(df, WriteMode.Overwrite, partitionBy = Seq("days(ts)"))
    val t = cat.table("ns.p")
    t.upsert(
      spark.range(10, 12).select($"id",
        to_timestamp(lit("2026-03-01 00:00:00")).as("ts"), lit(-1.0).as("v")),
      Seq("id"))
    assert(t.read(None).count() === 100)
    val moved = t.read(None).filter($"v" === -1.0).select($"id").as[Long].collect().sorted
    assert(moved === Array(10L, 11L))
  }
}
