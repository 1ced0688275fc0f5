package graft.lake

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** In-place parquet import ([[LakeTable.addFiles]] — Iceberg's
  * `add_files`/`migrate` shape): existing parquet becomes table data by
  * a METADATA-ONLY commit referencing the source dir's absolute URI.
  * The contract under test: no byte of the source is copied or
  * rewritten; imported rows are indistinguishable from written ones
  * (scans, stats skipping, metadata count, MOR DML, upserts, CDC); and
  * the table never deletes data it only references.
  */
class LakeAddFilesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(r: Range) =
    r.map(i => (i.toLong, s"name$i", i * 1.5)).toDF("id", "name", "v")

  /** Pre-existing parquet "legacy data" outside any table root. */
  private def legacyDir(r: Range, files: Int = 2): String = {
    val d = Files.createTempDirectory("addf-src-").toString
    df(r).repartitionByRange(files, $"id").write.mode("overwrite").parquet(d)
    d
  }

  private def fresh(): LakeCatalog =
    new LakeCatalog(spark, Files.createTempDirectory("addf-wh-").toString)

  test("migrate: import into a fresh table reads back exactly; nothing is copied") {
    val cat = fresh()
    val src = legacyDir(1 to 500)
    val t = cat.table("ns.m")
    val snap = t.addFiles(src)
    assert(snap.op === "add-files")
    assert(t.read().count() === 500L)
    assert(t.read().agg(sum($"id")).head.getLong(0) === (1 to 500).map(_.toLong).sum)
    // the manifest references the source; the table owns no data files
    assert(snap.dirs.size === 1)
    assert(LakeTable.externalDir(snap.dirs.head))
    assert(!io(t).isDir(t.loc("data")) ||
      io(t).countFiles(t.loc("data"), ".parquet") === 0)
    // metadata-only count(*) works from the footer-harvested row counts
    assert(t.metadataRowCount() === Some(500L))
  }

  private def io(t: LakeTable) = t.io

  test("append-import into an existing table; schema merge adds missing columns as nulls") {
    val cat = fresh()
    cat.write(df(1 to 100).withColumn("extra", lit("x")), "ns.a", WriteMode.Overwrite)
    val t = cat.table("ns.a")
    t.addFiles(legacyDir(101 to 150)) // source lacks `extra`
    assert(t.read().count() === 150L)
    assert(t.read().where($"extra".isNull).count() === 50L)
    assert(t.read().where($"id" > 100L && $"extra".isNull).count() === 50L)
  }

  test("imported files skip via footer-harvested stats") {
    val cat = fresh()
    // declare stats on id, then import: the import harvests min/max
    // from the source footers, so a narrow probe must not open every file
    cat.write(df(1 to 100), "ns.s", WriteMode.Overwrite, statsBy = Seq("id"))
    val t = cat.table("ns.s")
    t.addFiles(legacyDir(1001 to 2000, files = 4))
    val total = t.latest.get.dirs.map(d => io(t).countFiles(t.loc(d), ".parquet")).sum
    val probe = t.scan(Seq(LakePredicate.GtEq("id", 1100L), LakePredicate.LtEq("id", 1150L)))
    assert(probe.count() === 51L)
    probe.collect()
    val plan = probe.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val read = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s.metrics("numFiles").value
    }.sum
    assert(read < total, s"import must carry footer stats (read $read of $total files)")
  }

  test("merge-on-read DELETE reaches imported rows; compact adopts them") {
    val cat = fresh()
    cat.write(df(1 to 50), "ns.d", WriteMode.Overwrite)
    val t = cat.table("ns.d")
    t.addFiles(legacyDir(51 to 150))
    LakeDml.delete(t, $"id".between(100L, 120L), strategy = DmlStrategy.MergeOnRead)
    assert(t.latest.get.deleteDirs.nonEmpty, "expected a positional delete file")
    assert(t.read().count() === 129L)
    assert(t.read().where($"id".between(100L, 120L)).count() === 0L)
    // a rewrite adopts external data into owned dirs
    t.compact(targetPartitions = 2)
    assert(t.read().count() === 129L)
    assert(t.latest.get.dirs.forall(!LakeTable.externalDir(_)))
  }

  test("equality-delete upsert retires imported rows (sequence semantics span the import)") {
    val cat = fresh()
    val t = cat.table("ns.u")
    t.addFiles(legacyDir(1 to 100))
    // retire ids 1..10 with new values; insert 101..105
    val batch = (1 to 10).map(i => (i.toLong, s"NEW$i", -1.0)) ++
      (101 to 105).map(i => (i.toLong, s"name$i", i * 1.5))
    t.upsert(batch.toDF("id", "name", "v"), keys = Seq("id"))
    assert(t.read().count() === 105L)
    assert(t.read().where($"name".startsWith("NEW")).count() === 10L)
    assert(t.read().where($"id" <= 10L && !$"name".startsWith("NEW")).count() === 0L)
  }

  test("CDC changelog delivers an import as inserts") {
    val cat = fresh()
    cat.write(df(1 to 20), "ns.c", WriteMode.Overwrite)
    val t = cat.table("ns.c")
    val v0 = t.latest.get.version
    t.addFiles(legacyDir(21 to 60))
    val ch = t.readChanges(v0, Some(t.latest.get.version))
    assert(ch.where($"_change_type" === "insert").count() === 40L)
    assert(ch.where($"_change_type" =!= "insert").count() === 0L)
  }

  test("retention never deletes external source data") {
    val cat = fresh()
    val src = legacyDir(1 to 100)
    val t = cat.table("ns.r")
    t.addFiles(src)
    // overwrite makes the import's dir dead history; expiry must drop
    // the manifest but leave the external files alone
    t.write(df(200 to 210), WriteMode.Overwrite)
    val (manifests, dirs) = t.expireSnapshots(retainLast = 1)
    assert(manifests === 1)
    assert(dirs === 0, "external dirs must never be deleted by retention")
    assert(spark.read.parquet(src).count() === 100L, "source data must survive expiry")
  }

  test("guards: empty and in-root sources are rejected") {
    val cat = fresh()
    val t = cat.table("ns.g")
    t.write(df(1 to 10), WriteMode.Overwrite)
    val empty = Files.createTempDirectory("addf-empty-").toString
    intercept[IllegalArgumentException](t.addFiles(empty))
    intercept[IllegalArgumentException](t.addFiles(t.location("data")))
  }

  test("hive-partitioned import: layout columns re-materialize typed on every read") {
    val cat = fresh()
    val hive = Files.createTempDirectory("addf-hive-").toString
    df(1 to 40).withColumn("p", ($"id" % 2).cast("long"))
      .write.partitionBy("p").parquet(s"$hive/t")
    val t = cat.table("ns.hv")
    val snap = t.addFiles(s"$hive/t")
    // the layout column merged into the schema and its values came back
    assert(t.read().columns.contains("p"))
    assert(t.read().count() === 40L)
    assert(t.read().where($"p" === 1L).count() === 20L)
    assert(t.read().groupBy($"p").count().orderBy($"p")
      .as[(Long, Long)].collect().toSeq === Seq((0L, 20L), (1L, 20L)))
    // zero bytes copied: the manifest references the source URI
    assert(snap.dirs.exists(d => d.startsWith("/") || d.contains(":/")))
    // marker carried across a later append (dir-preserving commit)
    t.write(df(41 to 50).withColumn("p", lit(7L)), WriteMode.Append)
    assert(t.read().where($"p" === 7L).count() === 10L)
    assert(t.read().where($"p" === 0L).count() === 20L)
    // incremental read and CDC deliver the layout values, not nulls
    val incr = t.readIncremental(0L, Some(snap.version))
    assert(incr.where($"p".isNull).count() === 0L)
    assert(incr.count() === 40L)
    val changes = t.readChanges(0L, Some(snap.version))
    assert(changes.where($"p".isNull).count() === 0L)
    // rewrite adopts layout values into owned files as real columns
    t.compact(targetPartitions = 2)
    assert(t.latest.get.dirs.forall(d => !d.startsWith("/") && !d.contains(":/")))
    assert(t.read().where($"p" === 1L).count() === 20L)
  }

  test("binpack keeps a large hive import's layout marker (kept-dir meta carry)") {
    val cat = fresh()
    val hive = Files.createTempDirectory("addf-hive3-").toString
    df(1 to 4000).withColumn("p", ($"id" % 2).cast("long"))
      .write.partitionBy("p").parquet(s"$hive/t")
    val t = cat.table("ns.hvbp")
    t.addFiles(s"$hive/t")
    // two tiny appends to give binpack something to fold
    t.write(df(4001 to 4002).withColumn("p", lit(7L)), WriteMode.Append)
    t.write(df(4003 to 4004).withColumn("p", lit(7L)), WriteMode.Append)
    // threshold below the import's size: the hive dir is KEPT, and its
    // layout marker must survive the compact commit's meta filter
    val snap = t.compactBinPack(maxDirBytes = 8 * 1024)
    assert(snap.op === "compact")
    assert(t.read().where($"p" === 1L).count() === 2000L) // layout col still materializes
    assert(t.read().where($"p" === 7L).count() === 4L)
    assert(t.read().where($"p".isNull).count() === 0L)
  }

  test("hive-partitioned import: string values with special characters survive") {
    val cat = fresh()
    val hive = Files.createTempDirectory("addf-hive2-").toString
    val src = Seq((1L, "a b"), (2L, "x+y"), (3L, "p:q"), (4L, "plain"))
      .toDF("id", "seg")
    src.write.partitionBy("seg").parquet(s"$hive/t")
    val t = cat.table("ns.hv2")
    t.addFiles(s"$hive/t")
    assert(t.read().orderBy($"id").select($"seg").as[String].collect().toSeq ===
      Seq("a b", "x+y", "p:q", "plain"))
  }

  test("hive-partitioned import: commit stream refuses the dir loud") {
    val cat = fresh()
    val hive = Files.createTempDirectory("addf-hive3-").toString
    df(1 to 10).withColumn("p", ($"id" % 2).cast("long"))
      .write.partitionBy("p").parquet(s"$hive/t")
    val t = cat.table("ns.hv3")
    t.addFiles(s"$hive/t")
    val ex = intercept[Exception] {
      import org.apache.spark.sql.streaming.Trigger
      val q = spark.readStream.format(classOf[graft.streaming.GraftLakeSourceProvider].getName)
        .option("path", t.rootLocation).load()
        .writeStream.format("memory").queryName("hv3_refuse")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      q.stop()
      throw new IllegalStateException("stream should have failed on the hive import dir")
    }
    def chain(e: Throwable): Seq[String] =
      if (e == null) Nil else e.getMessage +: chain(e.getCause)
    assert(chain(ex).exists(m => m != null && m.contains("hive-layout import")))
  }

  test("SQL surface: CALL graft.system.add_files imports and reports rows") {
    val name = "addfcat"
    val wh = Files.createTempDirectory("addf-sql-").toString
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.lake.sqlcat.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    val cat = new LakeCatalog(spark, wh)
    cat.write(df(1 to 30), "ns.q", WriteMode.Overwrite)
    val src = legacyDir(31 to 90)
    val row = spark.sql(
      s"CALL $name.system.add_files(table => 'ns.q', source => '$src')").head
    assert(row.getLong(1) === 60L)
    assert(spark.sql(s"SELECT count(*) AS n FROM $name.ns.q").head.getLong(0) === 90L)
  }
}
