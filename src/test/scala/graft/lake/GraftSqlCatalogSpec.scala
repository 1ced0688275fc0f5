package graft.lake

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.lake.sqlcat.GraftCatalog

/** SQL surface over lake tables through the DSv2 catalog + LakeSqlRule:
  * live resolution (no stale views), time travel, writes, and the
  * MERGE/UPDATE/DELETE statements the reference's Iceberg extensions
  * exist for.
  */
class GraftSqlCatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val n = new AtomicInteger(0)

  /** Fresh uniquely-named catalog over a temp warehouse (catalog
    * instances cache per name, so isolation = one name per test).
    */
  private def freshCatalog(): (String, LakeCatalog) = {
    val name = s"gsql${n.incrementAndGet()}"
    val wh = Files.createTempDirectory(s"gsql-wh-").toString
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    (name, new LakeCatalog(spark, wh))
  }

  private def sample() =
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("id", "name", "v")

  test("SELECT resolves the live snapshot — a commit is visible to the NEXT query") {
    val (c, cat) = freshCatalog()
    cat.write(sample(), "ns.t", WriteMode.Overwrite)
    assert(spark.sql(s"SELECT count(*) AS n FROM $c.ns.t").head.getLong(0) === 3)
    cat.write(sample(), "ns.t", WriteMode.Append)
    // the SAME SQL text re-resolves and sees the append — no view refresh
    assert(spark.sql(s"SELECT count(*) AS n FROM $c.ns.t").head.getLong(0) === 6)
    assert(spark.sql(s"SELECT sum(v) AS s FROM $c.ns.t WHERE name <> 'a'").head.getDouble(0) === 100.0)
  }

  test("FOR VERSION AS OF time-travels through SQL") {
    val (c, cat) = freshCatalog()
    cat.write(sample(), "ns.tt", WriteMode.Overwrite)
    cat.write(sample().withColumn("v", $"v" * 10), "ns.tt", WriteMode.Overwrite)
    assert(spark.sql(s"SELECT sum(v) AS s FROM $c.ns.tt VERSION AS OF 1").head.getDouble(0) === 60.0)
    assert(spark.sql(s"SELECT sum(v) AS s FROM $c.ns.tt").head.getDouble(0) === 600.0)
  }

  test("VERSION AS OF resolves tag names (ref-based travel)") {
    val (c, cat) = freshCatalog()
    cat.write(sample(), "ns.tag", WriteMode.Overwrite)
    cat.table("ns.tag").createTag("release-1")
    cat.write(sample().withColumn("v", $"v" * 10), "ns.tag", WriteMode.Overwrite)
    assert(spark.sql(s"SELECT sum(v) AS s FROM $c.ns.tag VERSION AS OF 'release-1'")
      .head.getDouble(0) === 60.0)
    assert(spark.sql(s"SELECT sum(v) AS s FROM $c.ns.tag").head.getDouble(0) === 600.0)
    intercept[Exception](
      spark.sql(s"SELECT * FROM $c.ns.tag VERSION AS OF 'no-such-tag'").collect())
  }

  test("FOR TIMESTAMP AS OF time-travels through SQL") {
    val (c, cat) = freshCatalog()
    val v1 = cat.write(sample(), "ns.tst", WriteMode.Overwrite)
    cat.write(sample().withColumn("v", $"v" * 10), "ns.tst", WriteMode.Overwrite)
    // travel time as an expression (millis → catalog receives micros)
    assert(spark.sql(
      s"SELECT sum(v) AS s FROM $c.ns.tst TIMESTAMP AS OF timestamp_millis(${v1.timestampMs})")
      .head.getDouble(0) === 60.0)
    assert(spark.sql(s"SELECT sum(v) AS s FROM $c.ns.tst").head.getDouble(0) === 600.0)
    // a time before the first commit resolves no snapshot
    intercept[Exception](spark.sql(
      s"SELECT * FROM $c.ns.tst TIMESTAMP AS OF timestamp_millis(${v1.timestampMs - 1})").collect())
  }

  test("metadata tables address through SQL: t.files / t.partitions / t.snapshots") {
    val (c, cat) = freshCatalog()
    cat.write(sample().repartition(1), "ns.mt", WriteMode.Overwrite)
    cat.write(sample().repartition(1), "ns.mt", WriteMode.Append)
    assert(spark.sql(s"SELECT sum(record_count) AS n FROM $c.ns.mt.files").head.getLong(0) === 6)
    assert(spark.sql(s"SELECT count(*) AS n FROM $c.ns.mt.files").head.getLong(0) === 2)
    val p = spark.sql(s"SELECT n_files, n_rows FROM $c.ns.mt.partitions").head
    assert(p.getLong(0) === 2 && p.getLong(1) === 6)
    assert(spark.sql(s"SELECT count(*) AS n FROM $c.ns.mt.snapshots").head.getLong(0) === 2)
    assert(spark.sql(s"SELECT count(*) AS n FROM $c.ns.mt.history").head.getLong(0) === 2)
    // read-only: DML against a metadata table fails loudly
    val err = intercept[Exception](
      spark.sql(s"DELETE FROM $c.ns.mt.files WHERE record_count > 0"))
    assert(err.getMessage.contains("read-only") || err.getMessage.contains("metadata table"))
  }

  test("INSERT INTO appends; INSERT OVERWRITE replaces") {
    val (c, cat) = freshCatalog()
    cat.write(sample(), "ns.w", WriteMode.Overwrite)
    spark.sql(s"INSERT INTO $c.ns.w VALUES (4, 'd', 40.0)")
    assert(spark.sql(s"SELECT count(*) AS n FROM $c.ns.w").head.getLong(0) === 4)
    spark.sql(s"INSERT OVERWRITE $c.ns.w VALUES (9, 'z', 90.0)")
    assert(spark.sql(s"SELECT * FROM $c.ns.w").collect().map(_.getLong(0)).toSeq === Seq(9L))
    // history preserved: v1 original, v2 append, v3 overwrite
    assert(cat.table("ns.w").history.map(_.op) === Seq("overwrite", "append", "overwrite"))
  }

  test("df.writeTo(...).append() lands a lake commit") {
    val (c, cat) = freshCatalog()
    cat.write(sample(), "ns.wt", WriteMode.Overwrite)
    sample().withColumn("v", $"v" + 1).writeTo(s"$c.ns.wt").append()
    assert(cat.read("ns.wt").count() === 6)
  }

  test("CREATE TABLE / AS SELECT, DROP TABLE, SHOW-able metadata") {
    val (c, cat) = freshCatalog()
    spark.sql(s"CREATE TABLE $c.ns.empty (id BIGINT, s STRING)")
    assert(spark.sql(s"SELECT * FROM $c.ns.empty").count() === 0)
    spark.sql(s"INSERT INTO $c.ns.empty VALUES (1, 'x')")
    assert(spark.sql(s"SELECT s FROM $c.ns.empty").head.getString(0) === "x")

    cat.write(sample(), "ns.src", WriteMode.Overwrite)
    spark.sql(s"CREATE TABLE $c.ns.ctas AS SELECT id, v * 2 AS v2 FROM $c.ns.src")
    assert(spark.sql(s"SELECT sum(v2) AS s FROM $c.ns.ctas").head.getDouble(0) === 120.0)

    spark.sql(s"DROP TABLE $c.ns.ctas")
    assert(!cat.exists("ns.ctas"))
  }

  test("DELETE FROM with and without WHERE") {
    val (c, cat) = freshCatalog()
    cat.write(sample(), "ns.d", WriteMode.Overwrite)
    spark.sql(s"DELETE FROM $c.ns.d WHERE v >= 20.0")
    assert(spark.sql(s"SELECT id FROM $c.ns.d").collect().map(_.getLong(0)).toSeq === Seq(1L))
    spark.sql(s"DELETE FROM $c.ns.d")
    assert(spark.sql(s"SELECT * FROM $c.ns.d").count() === 0)
  }

  test("UPDATE SET evaluates against pre-update rows") {
    val (c, cat) = freshCatalog()
    cat.write(sample(), "ns.u", WriteMode.Overwrite)
    // both SETs read the PRE-update row: name takes old v, v doubles
    spark.sql(s"UPDATE $c.ns.u SET v = v * 2, name = concat(name, CAST(v AS INT)) WHERE id <= 2")
    val rows = spark.sql(s"SELECT id, name, v FROM $c.ns.u ORDER BY id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ===
      Seq((1L, "a10", 20.0), (2L, "b20", 40.0), (3L, "c", 30.0)))
  }

  test("MERGE INTO: update matched, insert not matched") {
    val (c, cat) = freshCatalog()
    cat.write(sample(), "ns.m", WriteMode.Overwrite)
    Seq((2L, "B", 200.0), (4L, "d", 40.0)).toDF("id", "name", "v")
      .createOrReplaceTempView("m_src")
    spark.sql(
      s"""MERGE INTO $c.ns.m t USING m_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val rows = spark.sql(s"SELECT id, name, v FROM $c.ns.m ORDER BY id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ===
      Seq((1L, "a", 10.0), (2L, "B", 200.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("MERGE INTO with explicit SET expressions over both sides") {
    val (c, cat) = freshCatalog()
    cat.write(sample(), "ns.m2", WriteMode.Overwrite)
    Seq((1L, 5.0), (3L, 7.0)).toDF("id", "bonus").createOrReplaceTempView("m2_src")
    spark.sql(
      s"""MERGE INTO $c.ns.m2 t USING m2_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET v = t.v + s.bonus""".stripMargin)
    val rows = spark.sql(s"SELECT id, v FROM $c.ns.m2 ORDER BY id").collect()
    assert(rows.map(r => (r.getLong(0), r.getDouble(1))).toSeq ===
      Seq((1L, 15.0), (2L, 20.0), (3L, 37.0)))
  }

  test("insert-only MERGE keeps matched rows untouched") {
    val (c, cat) = freshCatalog()
    cat.write(sample(), "ns.m3", WriteMode.Overwrite)
    Seq((3L, "X", 999.0), (5L, "e", 50.0)).toDF("id", "name", "v")
      .createOrReplaceTempView("m3_src")
    spark.sql(
      s"""MERGE INTO $c.ns.m3 t USING m3_src s ON t.id = s.id
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val rows = spark.sql(s"SELECT id, name, v FROM $c.ns.m3 ORDER BY id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ===
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (5L, "e", 50.0)))
  }

  test("MERGE INTO with WHEN MATCHED THEN DELETE") {
    val (c, cat) = freshCatalog()
    cat.write(sample(), "ns.md", WriteMode.Overwrite)
    Seq((2L, "B", 200.0)).toDF("id", "name", "v").createOrReplaceTempView("md_src")
    spark.sql(
      s"""MERGE INTO $c.ns.md t USING md_src s ON t.id = s.id
         |WHEN MATCHED THEN DELETE""".stripMargin)
    assert(spark.sql(s"SELECT id FROM $c.ns.md ORDER BY id").as[Long].collect()
      .toSeq === Seq(1L, 3L))
  }

  test("MERGE INTO: conditional DELETE + UPDATE + INSERT (CDC apply)") {
    val (c, cat) = freshCatalog()
    cat.write(sample(), "ns.mcd", WriteMode.Overwrite)
    Seq((1L, "A", 100.0, "u"), (2L, "b", 20.0, "d"), (7L, "g", 70.0, "u"))
      .toDF("id", "name", "v", "op").createOrReplaceTempView("mcd_src")
    spark.sql(
      s"""MERGE INTO $c.ns.mcd t USING mcd_src s ON t.id = s.id
         |WHEN MATCHED AND s.op = 'd' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET name = s.name, v = s.v
         |WHEN NOT MATCHED THEN INSERT (id, name, v) VALUES (s.id, s.name, s.v)""".stripMargin)
    val rows = spark.sql(s"SELECT id, name, v FROM $c.ns.mcd ORDER BY id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ===
      Seq((1L, "A", 100.0), (3L, "c", 30.0), (7L, "g", 70.0)))
  }

  test("partitioned table through SQL: CTAS PARTITIONED BY + pruned SELECT") {
    val (c, cat) = freshCatalog()
    cat.write(sample(), "ns.psrc", WriteMode.Overwrite)
    spark.sql(
      s"CREATE TABLE $c.ns.pt PARTITIONED BY (name) AS SELECT * FROM $c.ns.psrc")
    assert(cat.table("ns.pt").latest.get.partitionBy === Seq("name"))
    val got = spark.sql(s"SELECT id, v FROM $c.ns.pt WHERE name = 'b'").head
    assert((got.getLong(0), got.getDouble(1)) === ((2L, 20.0)))
  }

  test("ALTER TABLE: rename/add/drop/widen as SQL, metadata-only") {
    val (c, cat) = freshCatalog()
    cat.write(Seq((1, "a", 10.0), (2, "b", 20.0)).toDF("n", "s", "v"),
      "ns.alt", WriteMode.Overwrite)
    val t = cat.table("ns.alt")
    val dirsBefore = t.latest.get.dirs

    spark.sql(s"ALTER TABLE $c.ns.alt RENAME COLUMN v TO value")
    assert(spark.sql(s"SELECT value FROM $c.ns.alt ORDER BY n").as[Double].collect().toSeq
      === Seq(10.0, 20.0))

    spark.sql(s"ALTER TABLE $c.ns.alt ADD COLUMN tag STRING")
    val withTag = spark.sql(s"SELECT n, tag FROM $c.ns.alt ORDER BY n").collect()
    assert(withTag.forall(_.isNullAt(1)))

    spark.sql(s"ALTER TABLE $c.ns.alt ALTER COLUMN n TYPE BIGINT")
    assert(spark.sql(s"SELECT sum(n) AS s FROM $c.ns.alt").head.getLong(0) === 3L)

    spark.sql(s"ALTER TABLE $c.ns.alt DROP COLUMN s")
    assert(spark.sql(s"SELECT * FROM $c.ns.alt").columns.toSeq === Seq("n", "value", "tag"))

    // four DDLs, zero data rewrites
    assert(t.latest.get.dirs === dirsBefore)
    assert(t.history.map(_.op) ===
      Seq("overwrite", "rename", "add-column", "widen", "drop"))
  }

  test("racing SQL UPDATEs: no lost updates — losers fail with ConcurrentModification") {
    val (c, cat) = freshCatalog()
    cat.write(sample(), "ns.race", WriteMode.Overwrite)
    val results = (1 to 4).map { i =>
      new Thread(null, null, s"race-$i", 0) {
        var outcome: Either[Throwable, Unit] = Left(new IllegalStateException("not run"))
        override def run(): Unit =
          outcome =
            try Right { spark.sql(s"UPDATE $c.ns.race SET v = v + $i WHERE id = 1"); () }
            catch { case e: Throwable => Left(e) }
      }
    }
    results.foreach(_.start()); results.foreach(_.join())
    val (failed, succeeded) = results.partition(_.outcome.isLeft)
    assert(succeeded.nonEmpty, "at least one racer must commit")
    // every failure is the read-modify-write conflict, not corruption
    failed.foreach { t =>
      val e = t.outcome.left.toOption.get
      val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(x => s"${x.getClass.getName}: ${x.getMessage}").mkString(" | ")
      assert(msgs.contains("ConcurrentModification"), msgs)
    }
    // the surviving value reflects EXACTLY the successful updates
    val v = spark.sql(s"SELECT v FROM $c.ns.race WHERE id = 1").head.getDouble(0)
    val applied = succeeded.map(_.getName.stripPrefix("race-").toInt)
    assert(v === 10.0 + applied.sum, s"v=$v after updates $applied")
  }

  test("CALL refresh_view: persisted-definition materialized view refresh via SQL") {
    val (c, cat) = freshCatalog()
    cat.write(Seq((1L, "x", 10.0), (2L, "x", 20.0), (3L, "y", 5.0))
      .toDF("id", "g", "v"), "ns.ev", WriteMode.Overwrite)
    graft.lake.IncrementalView.refreshSql(cat, "ns.ev", "ns.ev_agg", Seq("g"),
      Seq("count(*) AS cnt", "sum(v) AS sum_v"))
    cat.write(Seq((4L, "y", 15.0)).toDF("id", "g", "v"), "ns.ev", WriteMode.Append)
    val r = spark.sql(s"CALL $c.system.refresh_view(view => 'ns.ev_agg')").head
    assert(r.getString(2) === "incremental")
    assert(r.getLong(1) === cat.table("ns.ev").latest.get.version)
    val got = graft.lake.IncrementalView.read(cat, "ns.ev_agg")
      .as[(String, Long, Double)].collect().toSet
    assert(got === Set(("x", 2L, 30.0), ("y", 2L, 20.0)))
    // already fresh: mode reports no movement needed
    val r2 = spark.sql(s"CALL $c.system.refresh_view(view => 'ns.ev_agg')").head
    assert(r2.getLong(0) === r.getLong(0)) // same view version
  }

  test("CALL procedures: compact, expire, orphans, set_partition_spec, rollback") {
    val (c, cat) = freshCatalog()
    val df = spark.range(0, 200).select($"id", ($"id" % 7).cast("double").as("v"))
    cat.write(df.repartition(6), "ns.pr", WriteMode.Overwrite)  // v1
    cat.write(df.repartition(6), "ns.pr", WriteMode.Append)     // v2
    val t = cat.table("ns.pr")

    // sorted compaction through SQL; result row carries the new version
    val comp = spark.sql(
      s"CALL $c.system.compact(table => 'ns.pr', target_partitions => 2, sort_by => 'id')").head
    assert(comp.getLong(0) === 3L && comp.getString(1) === "compact")
    assert(t.read(None).count() === 400)
    assert(t.scan(Seq(LakePredicate.EqualTo("id", 13L))).inputFiles.length === 1) // stats armed

    // spec evolution through SQL
    assert(spark.sql(
      s"CALL $c.system.set_partition_spec(table => 'ns.pr', spec => 'bucket(2, id)')")
      .head.getLong(0) === 4L)
    cat.write(df.limit(10), "ns.pr", WriteMode.Append)          // v5, bucket-partitioned
    assert(t.read(None).count() === 410)

    // rollback through SQL: back to the compacted v3 state
    val rb = spark.sql(
      s"CALL $c.system.rollback_to_version(table => 'ns.pr', version => 3)").head
    assert(rb.getLong(0) === 5L && rb.getLong(1) === 6L)
    assert(t.read(None).count() === 400)
    assert(t.latest.get.partitionBy.isEmpty) // v3's spec restored

    // expiry + orphan sweep through SQL (positional args)
    val exp = spark.sql(s"CALL $c.system.expire_snapshots('ns.pr', 1)").head
    assert(exp.getInt(0) === 5)
    assert(spark.sql(s"CALL $c.system.remove_orphan_files('ns.pr', 0)").head.getInt(0) >= 0)
    assert(t.read(None).count() === 400) // latest survives everything

    // delete-file rewrite through SQL: two MOR deletes fold to one dir
    LakeDml.delete(t, $"id" === 0L, strategy = DmlStrategy.MergeOnRead)
    LakeDml.delete(t, $"id" === 1L, strategy = DmlStrategy.MergeOnRead)
    val rpd = spark.sql(s"CALL $c.system.rewrite_position_deletes(table => 'ns.pr')").head
    assert(rpd.getInt(1) === 1) // folded delete-dir count
    assert(t.read(None).count() === 396) // ids are doubled; 2 deletes × 2 rows

    // unknown procedure fails with the available list (Spark wraps it
    // in FAILED_TO_LOAD_ROUTINE; ours is in the cause chain)
    val e = intercept[Exception](spark.sql(s"CALL $c.system.nope('ns.pr')"))
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .flatMap(x => Option(x.getMessage)).mkString(" | ")
    assert(msgs.contains("no procedure"), msgs)
  }

  test("CALL create_tag / drop_tag round-trips with SQL tag travel") {
    val (c, cat) = freshCatalog()
    cat.write(sample(), "ns.ct", WriteMode.Overwrite)
    val v = spark.sql(s"CALL $c.system.create_tag(table => 'ns.ct', tag => 'r1')")
      .head.getLong(0)
    assert(v === 1L)
    cat.write(sample().withColumn("v", $"v" * 10), "ns.ct", WriteMode.Overwrite)
    assert(spark.sql(s"SELECT sum(v) AS s FROM $c.ns.ct VERSION AS OF 'r1'")
      .head.getDouble(0) === 60.0)
    assert(spark.sql(s"SELECT name, type, version FROM $c.ns.ct.refs").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      === Seq(("r1", "tag", 1L)))
    assert(spark.sql(s"CALL $c.system.drop_tag(table => 'ns.ct', tag => 'r1')")
      .head.getBoolean(0))
    assert(spark.sql(s"SELECT * FROM $c.ns.ct.refs").count() === 0)
    intercept[Exception](
      spark.sql(s"SELECT * FROM $c.ns.ct VERSION AS OF 'r1'").collect())
  }

  test("SQL WHERE prunes hidden partitions and manifest-skips files") {
    val (c, cat) = freshCatalog()
    val df = spark.range(0, 1000).select(
      $"id",
      org.apache.spark.sql.functions.to_timestamp(
        org.apache.spark.sql.functions.lit("2026-01-01 00:00:00"))
        .plus(org.apache.spark.sql.functions.expr("make_interval(0,0,0,CAST(id/100 AS INT),0,0,0)"))
        .as("ts"),
      ($"id" % 7).cast("double").as("v"))
    cat.table("ns.hp").write(df, WriteMode.Overwrite, partitionBy = Seq("days(ts)"))
    // hidden-partition pruning: a ts range through plain SQL must show
    // partition filters on the derived _p_ column, like scan(preds)
    val q = spark.sql(
      s"SELECT count(*) AS n FROM $c.ns.hp WHERE ts >= TIMESTAMP '2026-01-09 00:00:00'")
    assert(q.head.getLong(0) === 200L) // days 8,9 → ids 800..999
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("_p_ts_day"), plan)

    // manifest file skipping: sorted compaction arms per-file stats;
    // an equality probe through SQL must open a subset of the files
    cat.write(spark.range(0, 600).select($"id", ($"id" % 13).cast("double").as("v")),
      "ns.fs", WriteMode.Overwrite)
    cat.table("ns.fs").compact(targetPartitions = 6, sortBy = Seq("id"))
    val probe = spark.sql(s"SELECT v FROM $c.ns.fs WHERE id = 317")
    assert(probe.head.getDouble(0) === (317 % 13).toDouble)
    assert(probe.inputFiles.length === 1,
      s"expected stats to skip to 1 of 6 files, read ${probe.inputFiles.length}")

    // IN-list probes prune as a disjunction of points: two values in
    // the same sorted file → still 1 file; spread values → 2
    val inProbe = spark.sql(s"SELECT v FROM $c.ns.fs WHERE id IN (317, 25)")
    assert(inProbe.collect().length === 2)
    assert(inProbe.inputFiles.length === 2,
      s"expected IN stats-skip to 2 of 6 files, read ${inProbe.inputFiles.length}")

    // IN on a bucket-partitioned table prunes dirs via per-value
    // bucket projection
    cat.table("ns.bk").write(
      spark.range(0, 400).select($"id", ($"id" * 2).as("y")),
      WriteMode.Overwrite, partitionBy = Seq("bucket(8, id)"))
    val bq = spark.sql(s"SELECT y FROM $c.ns.bk WHERE id IN (3, 9)")
    assert(bq.collect().map(_.getLong(0)).sorted === Array(6L, 18L))
    val bplan = bq.queryExecution.executedPlan.toString
    assert(bplan.contains("_p_id_bucket"), bplan)
  }

  test("CALL clone: zero-copy fork readable through SQL, divergent thereafter") {
    val (c, cat) = freshCatalog()
    cat.write(sample(), "ns.src", WriteMode.Overwrite)
    cat.write(sample().withColumn("id", $"id" + 10), "ns.src", WriteMode.Append) // v2
    val r = spark.sql(s"CALL $c.system.clone(table => 'ns.src', target => 'ns.fork')").head
    assert(r.getLong(0) === 2L && r.getInt(1) === 2) // lands AT v2, 2 referenced dirs
    assert(spark.sql(s"SELECT count(*) AS n FROM $c.ns.fork").head.getLong(0) === 6)
    // divergence: source append invisible to the fork
    cat.write(sample().withColumn("id", $"id" + 20), "ns.src", WriteMode.Append)
    assert(spark.sql(s"SELECT count(*) AS n FROM $c.ns.fork").head.getLong(0) === 6)
    assert(spark.sql(s"SELECT count(*) AS n FROM $c.ns.src").head.getLong(0) === 9)
  }

  test("unsupported MERGE shapes fail loudly, not wrongly") {
    val (c, cat) = freshCatalog()
    cat.write(sample(), "ns.bad", WriteMode.Overwrite)
    Seq((1L, "x", 1.0)).toDF("id", "name", "v").createOrReplaceTempView("bad_src")
    val e = intercept[Exception](spark.sql(
      s"""MERGE INTO $c.ns.bad t USING bad_src s ON t.id < s.id
         |WHEN MATCHED THEN UPDATE SET *""".stripMargin))
    assert(e.getMessage.contains("MERGE INTO graft tables supports"))
  }
}
