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

  test("string key columns take string keys — no bigint coercion over-delete") {
    val name = "privcat2"
    val wh = java.nio.file.Files.createTempDirectory("priv-sqlstr-").toString
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.lake.sqlcat.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    val cat = new LakeCatalog(spark, wh)
    // '042' and '42' are DIFFERENT subjects under a string key; the
    // old all-digits→Long guess made Spark cast the COLUMN to bigint
    // and erase both (ADVICE r9)
    val df = Seq(("42", 1.0), ("042", 2.0), ("x9", 3.0)).toDF("uid", "score")
    cat.write(df, "ns.s", WriteMode.Overwrite)
    val row = spark.sql(s"CALL $name.system.forget(" +
      "table => 'ns.s', key_col => 'uid', keys => '42')").head
    assert(row.getLong(0) === 1L, "exactly the named subject is erased")
    assert(cat.read("ns.s").where($"uid" === "042").count() === 1L,
      "'042' must survive a request for '42'")
  }

  test("anchors are pre-validated across ALL targets before any delete") {
    val cat = fresh(); seed(cat)
    val df2 = (1L to 20L).map(i => (i, i * 1.5)).toDF("uid", "v")
    cat.write(df2, "ns.u", WriteMode.Overwrite)
    cat.table("ns.u").createTag("hold")
    val pre = cat.read("ns.t").count()
    // ns.t has no anchor, ns.u does — the batch must fail BEFORE
    // touching ns.t (all-or-nothing, evidence preserved)
    val ex = intercept[IllegalArgumentException] {
      Privacy.forget(cat, Seq("ns.t" -> "uid", "ns.u" -> "uid"), Seq(1L))
    }
    assert(ex.getMessage.contains("hold"))
    assert(cat.read("ns.t").count() === pre,
      "first target must be untouched when a later target fails validation")
  }

  test("residual fails loud on a missing key column") {
    val cat = fresh(); seed(cat)
    val ex = intercept[IllegalArgumentException] {
      Privacy.residual(cat.table("ns.t"), "no_such_col", Seq(1L))
    }
    assert(ex.getMessage.contains("no_such_col"))
  }

  test("forgetDedupIndex cascades erasure into the at-ingest index tables") {
    val work = java.nio.file.Files.createTempDirectory("priv-casc-")
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),       // dup of 1
      (3L, "one two three four five six seven"),
      (4L, "totally different words in this row here"))
      .toDF("doc_id", "text")
    graft.ops.IncrementalDedup.ingest(spark, docs, work, "a1", slices = 2)
    // doc 2 was tombstoned against doc 1; now erase subject 1
    val results = Privacy.forgetDedupIndex(spark, work, Seq(1L))
    val byTbl = results.map(r => r.ident -> r).toMap
    assert(byTbl.keySet === Set("bands", "shingles", "drops", "arrivals"))
    results.foreach(r => assert(r.residualRows === 0L, s"${r.ident} residual"))
    assert(byTbl("bands").rowsDeleted > 0L)
    assert(byTbl("shingles").rowsDeleted === 1L)
    // the RAW text in the arrivals staging slices is scrubbed too —
    // the most sensitive copy of the subject's data
    assert(byTbl("arrivals").rowsDeleted === 1L)
    assert(spark.read.parquet(work.resolve("arrivals").toString + "/*/*")
      .where($"doc_id" === 1L).count() === 0L,
      "subject's raw text must be gone from the staging slices")
    Seq("bands", "shingles", "drops").foreach { n =>
      val t = new LakeTable(spark, work.resolve(n).toString)
      assert(t.read().where($"id" === 1L).count() === 0L, s"$n keeps subject")
      assert(t.history.size === 1, s"$n history survived")
    }
    // doc 2's tombstone (id=2, dropped against the subject) SURVIVES:
    // erasure removes the subject's data, it does not re-run curation
    assert(new LakeTable(spark, work.resolve("drops").toString)
      .read().where($"id" === 2L).count() === 1L)
    // the bucketed layout survives the COW rewrite: a fresh ingest
    // against the erased index still works end to end
    val more = Seq((5L, "one two three four five six seven")).toDF("doc_id", "text")
    graft.ops.IncrementalDedup.ingest(spark, more, work, "a2", slices = 1)
    val kept = graft.ops.IncrementalDedup
      .keptReport(spark, docs.union(more).where($"doc_id" =!= 1L), work)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(kept === Map(2L -> false, 3L -> true, 4L -> true, 5L -> false),
      "post-erasure index still deduplicates new arrivals")
  }

  test("two key columns on one table erase sequentially, both applied") {
    val cat = fresh()
    // the subject can appear as EITHER party of an interaction
    val df = (1L to 40L).map(i => (i, i % 7, i % 11)).toDF("eid", "from_uid", "to_uid")
    cat.write(df, "ns.inter", WriteMode.Overwrite)
    val results = Privacy.forget(cat,
      Seq("ns.inter" -> "from_uid", "ns.inter" -> "to_uid"), Seq(3L))
    assert(results.size === 2)
    assert(results.map(_.ident) === Seq("ns.inter", "ns.inter"))
    results.foreach(r => assert(r.residualRows === 0L))
    val left = cat.read("ns.inter")
    assert(left.where($"from_uid" === 3 || $"to_uid" === 3).count() === 0L)
    assert(left.count() === 40L - 6L - 3L) // 6 by from (7,10..38), 3 more by to
  }

  test("forgetCatalog discovers and erases subject-keyed derived tables") {
    val cat = fresh(); seed(cat)
    // a derived per-uid rollup AND an unrelated table without the key
    cat.write(cat.read("ns.t").groupBy($"uid").agg(count(lit(1)).as("n")),
      "gold.by_uid", WriteMode.Overwrite)
    cat.write(Seq((10L, "x")).toDF("other_id", "v"), "ns.unrelated", WriteMode.Overwrite)
    assert(cat.listTables() === Seq("gold.by_uid", "ns.t", "ns.unrelated"))
    val results = Privacy.forgetCatalog(cat, "uid", (1L to 10L))
    assert(results.map(_.ident).toSet === Set("ns.t", "gold.by_uid"),
      "every table carrying the key column, and only those")
    results.foreach { r =>
      assert(r.rowsDeleted === 10L, r.ident)
      assert(r.residualRows === 0L, r.ident)
    }
    assert(cat.read("gold.by_uid").where($"uid" <= 10).count() === 0L)
    assert(cat.read("ns.unrelated").count() === 1L, "unrelated table untouched")
  }

  test("forgetCatalog refuses mixed key-column types, matches case-insensitively") {
    val cat = fresh(); seed(cat)                       // ns.t: uid BIGINT
    cat.write(Seq(("42", 1.0), ("042", 2.0)).toDF("UID", "v"),
      "ns.strkeys", WriteMode.Overwrite)               // UID STRING, different case
    // bigint keys against a catalog that ALSO holds a string-typed
    // uid: coercion would erase '042' for a request naming 42 — the
    // batch must fail loud BEFORE any delete
    val ex = intercept[IllegalArgumentException] {
      Privacy.forgetCatalog(cat, "uid", Seq(42L))
    }
    assert(ex.getMessage.contains("mixed"))
    assert(cat.read("ns.t").count() === 100L, "nothing erased on refusal")
    assert(cat.read("ns.strkeys").count() === 2L)
    // with the string table excluded the request goes through, and
    // case-insensitive discovery is what SAW ns.strkeys at all
    val ok = Privacy.forgetCatalog(cat, "uid", Seq(42L), exclude = Seq("ns.strkeys"))
    assert(ok.map(_.ident) === Seq("ns.t"))
    assert(cat.read("ns.t").where($"uid" === 42L).count() === 0L)
  }

  test("SQL surface: CALL graft.system.forget_catalog discovers and erases") {
    val name = "privcat3"
    val wh = java.nio.file.Files.createTempDirectory("priv-sqlcat-").toString
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.lake.sqlcat.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    val cat = new LakeCatalog(spark, wh)
    seed(cat)
    cat.write(cat.read("ns.t").groupBy($"uid").agg(count(lit(1)).as("n")),
      "gold.by_uid", WriteMode.Overwrite)
    cat.write(Seq((1L, "z")).toDF("uid", "v"), "ns.skipme", WriteMode.Overwrite)
    val rows = spark.sql(s"CALL $name.system.forget_catalog(" +
      "key_col => 'uid', keys => '1, 2', exclude => 'ns.skipme')")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(5))).toMap
    assert(rows.keySet === Set("ns.t", "gold.by_uid"),
      "one evidence row per discovered table; excluded table untouched")
    rows.values.foreach { case (deleted, residual) =>
      assert(deleted === 2L); assert(residual === 0L)
    }
    assert(cat.read("ns.skipme").count() === 1L)
    assert(cat.read("ns.t").where($"uid" <= 2).count() === 0L)
  }

  test("forgetSegments erases subject BITS from bitmap segment state") {
    import graft.functions.{BitmapFunctions => BF}
    val segT = new LakeTable(spark,
      java.nio.file.Files.createTempDirectory("priv-seg-").resolve("segments").toString)
    def segs(rows: Seq[(Long, String)]) = rows.toDF("user_id", "k")
      .groupBy($"k").agg(BF.bitmap64_agg($"user_id").as("bm"))
    // two commits so expiry has history to purge; subject 1 is in
    // segments a and b, absent from c
    segT.write(segs(Seq((1L, "a"), (2L, "a"), (1L, "b"), (3L, "b"))), WriteMode.Overwrite)
    segT.write(segs(Seq((4L, "c"), (5L, "c"))), WriteMode.Append)
    val res = Privacy.forgetSegments(segT, Seq(1L))
    assert(res.rowsDeleted === 2L, "both segments containing the subject rewrite")
    assert(res.residualRows === 0L, "no subject bit may remain in any file on disk")
    assert(segT.history.size === 1)
    val counts = segT.read()
      .select($"k", BF.bitmap64_count($"bm").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("a" -> 1L, "b" -> 1L, "c" -> 2L),
      "other members' bits survive exactly")
    // a segment emptied entirely stays as a zero-member slice
    val res2 = Privacy.forgetSegments(segT, Seq(4L, 5L))
    assert(res2.residualRows === 0L)
    val after = segT.read().select($"k", BF.bitmap64_count($"bm").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after("c") === 0L)
  }

  test("ingest → erase → resume on the committed-commit source: loud failure, seeded recovery") {
    import org.apache.spark.sql.streaming.Trigger
    val cat = fresh()
    val df = (1L to 100L).map(i => (i, s"user$i", i * 10.0)).toDF("uid", "name", "score")
    cat.write(df.filter($"uid" <= 50), "br.ev", WriteMode.Overwrite)
    cat.table("br.ev").write(df.filter($"uid" > 50), WriteMode.Append)
    val out = java.nio.file.Files.createTempDirectory("priv-stream-")
    def drain(ckpt: String, sink: String, startingVersion: Option[String] = None): Unit = {
      val q = graft.streaming.StreamingLakeSource
        .committedStream(cat.table("br.ev"), skipRewriteCommits = true,
          startingVersion = startingVersion)
        .writeStream.format("parquet")
        .option("path", out.resolve(sink).toString)
        .option("checkpointLocation", out.resolve(ckpt).toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain("ck1", "data1")
    assert(spark.read.parquet(out.resolve("data1").toString).count() === 100L)

    // erasure rewrites the table (COW delete) AND expires every
    // pre-erasure snapshot — including the version the stream's
    // checkpoint points at
    val Seq(r) = Privacy.forget(cat, Seq("br.ev" -> "uid"), (1L to 10L))
    assert(r.residualRows === 0L)
    val vAfterErase = cat.table("br.ev").latest.get.version
    // append under the table's CURRENT schema generation (the COW
    // erase rewrote to the nullable read-schema flavor; the source
    // pins one generation per stream and refuses mixes by design)
    val curSchema = cat.table("br.ev").latest.get.schema
    cat.table("br.ev").write(
      spark.createDataFrame(
        spark.sparkContext.parallelize((101L to 110L).map(i =>
          org.apache.spark.sql.Row(i, s"user$i", i * 10.0))), curSchema),
      WriteMode.Append)

    // resume on the old checkpoint: the manifest-driven source must
    // FAIL LOUD (its offset's snapshot is gone), never silently
    // re-deliver rewritten history as fresh rows
    val ex = intercept[Exception] { drain("ck1", "data1") }
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("expired") || msgs.contains("gone"),
      s"resume must name the expired snapshot, got: $msgs")
    assert(spark.read.parquet(out.resolve("data1").toString).count() === 100L,
      "failed resume must not have written anything")

    // documented recovery: a FRESH checkpoint seeded past the erasure
    // commit delivers exactly the post-erasure appends — no replay of
    // rewritten history, no subject rows
    drain("ck2", "data2", startingVersion = Some((vAfterErase + 1).toString))
    val uids = spark.read.parquet(out.resolve("data2").toString)
      .select($"uid").collect().map(_.getLong(0)).sorted
    assert(uids.toSeq === (101L to 110L), s"recovery stream delivered ${uids.toSeq}")
  }

  test("multi-part arrival slice fails loud with a recovery path; leftover temp dirs sweep") {
    import java.nio.file.Files
    val work = Files.createTempDirectory("priv-arr-")
    val arr = work.resolve("arrivals")
    Files.createDirectories(arr.resolve("b1"))
    Files.writeString(arr.resolve("_id_col"), "doc_id")
    // an externally-produced TWO-part slice violates the coalesce(1)
    // ingest contract; erasure must refuse with recovery guidance
    Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text").repartition(2)
      .write.parquet(arr.resolve("b1").resolve("slice_000").toString)
    // and a leftover temp dir from a crashed prior erasure must be
    // swept up front (underscore keeps it invisible to the ingest glob
    // meanwhile)
    val leftover = arr.resolve("b1").resolve("_slice_999.erasing")
    Files.createDirectories(leftover)
    Files.writeString(leftover.resolve("junk.txt"), "x")
    val ex = intercept[IllegalArgumentException] {
      Privacy.forgetDedupIndex(spark, work, Seq(1L))
    }
    assert(ex.getMessage.contains("single-part"))
    assert(ex.getMessage.toLowerCase.contains("compact"),
      s"error must tell the operator how to recover, got: ${ex.getMessage}")
    assert(!Files.exists(leftover), "leftover .erasing dirs must be swept")
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
