package graft.lake

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Shallow clone: zero data movement, verbatim sequence semantics,
  * independent evolution on both sides of the fork.
  */
class LakeCloneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dataFileCount(root: String): Long = {
    val dir = new java.io.File(root)
    if (!dir.exists()) 0L
    else {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1L else 0L
      // count only data files, not _versions manifests
      dir.listFiles().filterNot(_.getName == "_versions").map(walk).sum
    }
  }

  test("clone moves no data, reads identically, and preserves upsert seq semantics") {
    val cat = new LakeCatalog(spark, Files.createTempDirectory("clone-spec-").toString)
    cat.write(Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "v"), "ns.src", WriteMode.Overwrite)
    val src = cat.table("ns.src")
    // upsert creates an equality delete whose seq must outrank the base
    // dir's seq — the exact invariant a clone must carry verbatim
    src.upsert(Seq((2L, "b2", 200.0), (4L, "d", 40.0)).toDF("id", "name", "v"),
      keys = Seq("id"))

    val snap = cat.cloneTable("ns.src", "ns.dst")
    val dst = cat.table("ns.dst")
    assert(snap.version === src.latest.get.version) // fork lands AT the source version
    assert(dataFileCount(dst.rootLocation) === 0L)  // zero copy: only the manifest exists

    val want = Seq((1L, "a", 10.0), (2L, "b2", 200.0), (3L, "c", 30.0), (4L, "d", 40.0))
    assert(dst.read(None).orderBy($"id").as[(Long, String, Double)].collect().toSeq === want)

    // post-clone upsert on the CLONE must retire cloned rows (its eq-delete
    // seq outranks every preserved dir seq) and must not touch the source
    dst.upsert(Seq((1L, "a9", 90.0)).toDF("id", "name", "v"), keys = Seq("id"))
    assert(dst.read(None).orderBy($"id").as[(Long, String, Double)].collect().toSeq ===
      Seq((1L, "a9", 90.0), (2L, "b2", 200.0), (3L, "c", 30.0), (4L, "d", 40.0)))
    assert(src.read(None).orderBy($"id").as[(Long, String, Double)].collect().toSeq === want)

    // and commits on the SOURCE never surface in the clone
    src.write(Seq((5L, "e", 50.0)).toDF("id", "name", "v"), WriteMode.Append)
    assert(!dst.read(None).select($"id").as[Long].collect().contains(5L))
  }

  test("clone carries partition specs, stats skipping, and metadata-only counts") {
    val cat = new LakeCatalog(spark, Files.createTempDirectory("clone-spec2-").toString)
    val df = (1 to 40).map(i => (i.toLong, i % 4, i * 1.5)).toDF("id", "p", "v")
    cat.write(df, "ns.src", WriteMode.Overwrite, partitionBy = Seq("p"),
      statsBy = Seq("id"))
    cat.cloneTable("ns.src", "ns.dst")
    val dst = cat.table("ns.dst")
    // metadata-only count from carried per-dir row footprints — no scan
    assert(dst.metadataRowCount(None) === Some(40L))
    // partition pruning works through the remapped absolute dirs
    assert(dst.scan(Seq(LakePredicate.EqualTo("p", 2)), None)
      .select($"id").as[Long].collect().sorted ===
      (1 to 40).filter(_ % 4 == 2).map(_.toLong).toArray)
    // carried column stats prune files on an id range probe
    val bounds = dst.metadataBounds("id", None)
    assert(bounds === Some((BigDecimal(1), BigDecimal(40))))
  }

  test("clone of a MOR table applies positional deletes; maintenance never deletes source files") {
    val cat = new LakeCatalog(spark, Files.createTempDirectory("clone-spec3-").toString)
    cat.write((1 to 20).map(i => (i.toLong, s"n$i")).toDF("id", "name"),
      "ns.src", WriteMode.Overwrite)
    val src = cat.table("ns.src")
    // force a merge-on-read positional delete (no rewrite)
    LakeDml.delete(src, $"id" <= 5, strategy = DmlStrategy.MergeOnRead)
    cat.cloneTable("ns.src", "ns.dst")
    val dst = cat.table("ns.dst")
    assert(dst.read(None).select($"id").as[Long].collect().sorted ===
      (6L to 20L).toArray)
    // clone-side retention must not delete the EXTERNAL source dirs
    dst.write(Seq((99L, "x")).toDF("id", "name"), WriteMode.Append)
    dst.expireSnapshots(retainLast = 1)
    dst.removeOrphanFiles(graceMs = 0L)
    assert(src.read(None).select($"id").as[Long].collect().sorted ===
      (6L to 20L).toArray) // source intact
    assert(dst.read(None).select($"id").as[Long].collect().sorted ===
      ((6L to 20L) :+ 99L).sorted.toArray)
  }
}
