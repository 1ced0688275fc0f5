package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.lake.LakeCatalog

class StreamingLakeSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("stream drains into lake snapshots; restart appends only new batches") {
    val cat = new LakeCatalog(spark, Files.createTempDirectory("slake-").toString)
    val checkpoint = Files.createTempDirectory("slake-ckpt-").toString

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = "/root/testdata/sf0.001/events.parquet"
    val schema = spark.read.parquet(path).schema
    val dir = Files.createTempDirectory("slake-src-")
    Files.createSymbolicLink(dir.resolve("events.parquet"),
      java.nio.file.Paths.get(path))

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(dir.toString)
      val q = StreamingLakeSink.appendStream(stream, cat, "bronze.events", checkpoint)
      q.awaitTermination()
    }
    runOnce()
    val n1 = cat.read("bronze.events").count()
    assert(n1 === spark.read.parquet(path).count())

    // restart with the same checkpoint: no new files → no new rows
    runOnce()
    assert(cat.read("bronze.events").count() === n1)
    assert(cat.read("bronze.events").columns.contains("_batch_id"))
  }

  test("replayed micro-batch append is a detected no-op, even past foreign commits") {
    import graft.lake.WriteMode
    val cat = new LakeCatalog(spark, Files.createTempDirectory("slonce-").toString)
    val marker = StreamingLakeSink.markerKey("/ckpt/app-a")
    val batch = Seq((1L, "x"), (2L, "y")).toDF("id", "s")
    StreamingLakeSink.appendBatchOnce(cat, "ns.t", batch, 0L, marker, Nil)
    val v1 = cat.table("ns.t").latest.get.version
    // straight replay (foreachBatch retry): no commit, no duplicate rows
    StreamingLakeSink.appendBatchOnce(cat, "ns.t", batch, 0L, marker, Nil)
    assert(cat.table("ns.t").latest.get.version === v1)
    assert(cat.read("ns.t").count() === 2L)
    // a FOREIGN append lands between commit and replay: the marker is
    // no longer on the latest snapshot, but the newest-first walk must
    // still find it — replay stays a no-op
    cat.write(Seq((9L, "z")).toDF("id", "s"), "ns.t", WriteMode.Append)
    StreamingLakeSink.appendBatchOnce(cat, "ns.t", batch, 0L, marker, Nil)
    assert(cat.read("ns.t").count() === 3L)
    // compaction folds files but carries the marker (CarryMetaPrefix):
    // a replay after compaction is STILL a no-op
    cat.table("ns.t").compactBinPack(maxDirBytes = 1L << 30)
    StreamingLakeSink.appendBatchOnce(cat, "ns.t", batch, 0L, marker, Nil)
    assert(cat.read("ns.t").count() === 3L)
    // a different sink identity (other checkpoint) is not confused by
    // this sink's marker: its batch 0 lands
    val other = StreamingLakeSink.markerKey("/ckpt/app-b")
    StreamingLakeSink.appendBatchOnce(cat, "ns.t",
      Seq((7L, "w")).toDF("id", "s"), 0L, other, Nil)
    assert(cat.read("ns.t").count() === 4L)
    // and the next batch of the original sink flows normally
    StreamingLakeSink.appendBatchOnce(cat, "ns.t",
      Seq((3L, "v")).toDF("id", "s"), 1L, marker, Nil)
    assert(cat.read("ns.t").count() === 5L)
  }

  test("lake table as streaming source: appends consumed incrementally across restarts") {
    import org.apache.spark.sql.streaming.Trigger
    val cat = new LakeCatalog(spark, Files.createTempDirectory("slsrc-").toString)
    val ckpt = Files.createTempDirectory("slsrc-ckpt-").toString
    val sink = Files.createTempDirectory("slsrc-out-").toString
    import graft.lake.WriteMode
    cat.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), "ns.src", WriteMode.Overwrite)
    def drainOnce(): Unit = {
      val q = StreamingLakeSource.appendsStream(cat.table("ns.src"))
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drainOnce()
    assert(spark.read.parquet(sink).count() === 2)
    // append a new commit; only the delta flows on the next drain
    cat.write(Seq((3L, "c")).toDF("id", "s"), "ns.src", WriteMode.Append)
    drainOnce()
    val got = spark.read.parquet(sink).select($"id").as[Long].collect().sorted
    assert(got === Array(1L, 2L, 3L)) // no re-delivery of v1 rows
    // idempotent: draining again with no new commits adds nothing
    drainOnce()
    assert(spark.read.parquet(sink).count() === 3)
  }

  test("streaming medallion: stream → bronze lake → incremental consume → silver lake") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.lake.WriteMode
    val cat = new LakeCatalog(spark, Files.createTempDirectory("smed-").toString)
    val srcCkpt = Files.createTempDirectory("smed-c1-").toString
    val silverCkpt = Files.createTempDirectory("smed-c2-").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = "/root/testdata/sf0.001/events.parquet"
    val schema = spark.read.parquet(path).schema
    val dir = Files.createTempDirectory("smed-src-")
    Files.createSymbolicLink(dir.resolve("events.parquet"),
      java.nio.file.Paths.get(path))
    // stage 1: external stream → bronze lake appends
    val raw = spark.readStream.schema(schema).parquet(dir.toString)
    val q1 = StreamingLakeSink.appendStream(raw, cat, "bronze.ev", srcCkpt)
    q1.awaitTermination()
    // stage 2: bronze lake AS A SOURCE → dedup → silver lake
    val bronzeStream = graft.Tables.normalizeTs(
        StreamingLakeSource.appendsStream(cat.table("bronze.ev")))
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val q2 = bronzeStream.writeStream
      .option("checkpointLocation", silverCkpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        cat.write(batch, "silver.ev", WriteMode.Append); ()
      }.start()
    q2.awaitTermination()
    val bronzeN = spark.read.parquet(path).count()
    assert(cat.read("silver.ev").count() === bronzeN)
    assert(cat.read("silver.ev").select($"event_id").distinct().count() === bronzeN)
  }

  test("partitioned sink table consumed via appendsStream: counts and user schema survive the hive nesting") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.lake.WriteMode
    val cat = new LakeCatalog(spark, Files.createTempDirectory("slpart-").toString)
    val sinkCkpt = Files.createTempDirectory("slpart-c1-").toString
    val srcCkpt = Files.createTempDirectory("slpart-c2-").toString
    val out = Files.createTempDirectory("slpart-out-").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = "/root/testdata/sf0.001/events.parquet"
    val schema = spark.read.parquet(path).schema
    val dir = Files.createTempDirectory("slpart-src-")
    Files.createSymbolicLink(dir.resolve("events.parquet"),
      java.nio.file.Paths.get(path))
    // feed a days(ts)-partitioned bronze table through the sink: files
    // land nested under data/<uuid>/_p_ts_day=... — the source glob
    // must list through the partition level and deliver user columns
    val stream = graft.Tables.normalizeTs(
      spark.readStream.schema(schema).parquet(dir.toString))
    val q1 = StreamingLakeSink.appendStream(stream, cat, "bronze.pp", sinkCkpt,
      partitionBy = Seq("days(ts)"))
    q1.awaitTermination()
    val t = cat.table("bronze.pp")
    val expected = cat.read("bronze.pp").count()
    assert(expected === spark.read.parquet(path).count())

    def drain(): Unit = {
      val q = StreamingLakeSource.appendsStream(t)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", srcCkpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    val consumed = spark.read.parquet(out)
    assert(consumed.count() === expected)
    // user schema only: no derived partition columns leak through
    assert(!consumed.columns.exists(_.startsWith("_p_")))
    assert(consumed.columns.sorted === t.read(None).columns.sorted)
    // a further partitioned append flows incrementally, not re-delivered
    cat.write(t.read(None).limit(7), "bronze.pp", WriteMode.Append)
    drain()
    assert(spark.read.parquet(out).count() === expected + 7)
  }

  test("committed stream: manifest-driven micro-batches, uncommitted staged dirs never delivered") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.lake.WriteMode
    val cat = new LakeCatalog(spark, Files.createTempDirectory("slcom-").toString)
    val ckpt = Files.createTempDirectory("slcom-ckpt-").toString
    val out = Files.createTempDirectory("slcom-out-").toString
    cat.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), "ns.c", WriteMode.Overwrite)
    val t = cat.table("ns.c")

    // plant a STAGED-BUT-UNCOMMITTED dir (a writer that died before its
    // manifest publish): raw-glob sources would deliver these rows
    Seq((666L, "orphan")).toDF("id", "s").write
      .parquet(t.root.resolve("data/dead-writer-staging").toString)

    def drain(): Unit = {
      val q = StreamingLakeSource.committedStream(t)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    assert(spark.read.parquet(out).select($"id").as[Long].collect().sorted === Array(1L, 2L))

    // appends flow incrementally; the orphan stays undelivered forever
    cat.write(Seq((3L, "c")).toDF("id", "s"), "ns.c", WriteMode.Append)
    cat.write(Seq((4L, "d")).toDF("id", "s"), "ns.c", WriteMode.Append)
    drain()
    assert(spark.read.parquet(out).select($"id").as[Long].collect().sorted ===
      Array(1L, 2L, 3L, 4L))
    // no new commits → empty batch, no re-delivery
    drain()
    assert(spark.read.parquet(out).count() === 4)
  }

  test("committed stream delivers a partitioned table and survives restarts by version offset") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.lake.WriteMode
    val cat = new LakeCatalog(spark, Files.createTempDirectory("slcomp-").toString)
    val ckpt = Files.createTempDirectory("slcomp-ckpt-").toString
    val out = Files.createTempDirectory("slcomp-out-").toString
    val df = Seq(("2024-01-01 10:00:00", 1L), ("2024-01-02 10:00:00", 2L))
      .toDF("s", "id").select(to_timestamp($"s").as("ts"), $"id")
    cat.write(df, "ns.p", WriteMode.Overwrite, partitionBy = Seq("days(ts)"))
    val t = cat.table("ns.p")
    def drain(): Unit = {
      val q = StreamingLakeSource.committedStream(t)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    assert(spark.read.parquet(out).count() === 2)
    assert(!spark.read.parquet(out).columns.exists(_.startsWith("_p_")))
    cat.write(df, "ns.p", WriteMode.Append)
    drain() // restart recovers the version offset from the checkpoint
    assert(spark.read.parquet(out).count() === 4)
  }

  test("admission control: a 20-commit backlog drains in bounded micro-batches") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.lake.WriteMode
    val cat = new LakeCatalog(spark, Files.createTempDirectory("sladm-").toString)
    val ckpt = Files.createTempDirectory("sladm-ckpt-").toString
    val out = Files.createTempDirectory("sladm-out-").toString
    cat.write(Seq((0L, "seed")).toDF("id", "s"), "ns.a", WriteMode.Overwrite)
    (1L to 19L).foreach(i =>
      cat.write(Seq((i, s"r$i")).toDF("id", "s"), "ns.a", WriteMode.Append))
    val t = cat.table("ns.a")
    assert(t.latest.get.version === 20L)
    val q = StreamingLakeSource.committedStream(t, maxCommitsPerTrigger = Some(4))
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(0)).start()
    q.processAllAvailable()
    q.stop()
    // everything drained...
    assert(spark.read.parquet(out).select($"id").as[Long].collect().sorted
      === (0L to 19L).toArray)
    // ...and no single batch spanned more than 4 commit versions
    val spans = q.recentProgress.toSeq
      .filter(_.sources.nonEmpty)
      .map(p => (Option(p.sources.head.startOffset).map(_.trim.toLong).getOrElse(0L),
        Option(p.sources.head.endOffset).map(_.trim.toLong).getOrElse(0L)))
      .filter { case (s, e) => e > s }
    assert(spans.nonEmpty && spans.forall { case (s, e) => e - s <= 4 },
      s"batch spans exceeded the cap: $spans")
    assert(spans.size >= 5) // 20 commits / 4 per trigger
  }

  test("Trigger.AvailableNow with a commit cap drains the whole backlog, not one batch") {
    // regression: without SupportsTriggerAvailableNow the engine's
    // generic wrapper froze the FIRST capped getOffset as the run's
    // end — a capped AvailableNow stream delivered one batch (4 of 20
    // commits) and terminated "successfully"
    import org.apache.spark.sql.streaming.Trigger
    import graft.lake.WriteMode
    val cat = new LakeCatalog(spark, Files.createTempDirectory("slanow-").toString)
    val ckpt = Files.createTempDirectory("slanow-ckpt-").toString
    val out = Files.createTempDirectory("slanow-out-").toString
    cat.write(Seq((0L, "seed")).toDF("id", "s"), "ns.an", WriteMode.Overwrite)
    (1L to 19L).foreach(i =>
      cat.write(Seq((i, s"r$i")).toDF("id", "s"), "ns.an", WriteMode.Append))
    val t = cat.table("ns.an")
    val q = StreamingLakeSource.committedStream(t, maxCommitsPerTrigger = Some(4))
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.read.parquet(out).select($"id").as[Long].collect().sorted
      === (0L to 19L).toArray)
    val spans = q.recentProgress.toSeq
      .filter(_.sources.nonEmpty)
      .map(p => (Option(p.sources.head.startOffset).map(_.trim.toLong).getOrElse(0L),
        Option(p.sources.head.endOffset).map(_.trim.toLong).getOrElse(0L)))
      .filter { case (s, e) => e > s }
    assert(spans.forall { case (s, e) => e - s <= 4 },
      s"batch spans exceeded the cap: $spans")
    assert(spans.size >= 5, s"expected >= 5 capped batches, got $spans")
  }

  test("maxBytesPerTrigger: backlog drains one commit per batch under a tiny byte cap") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.lake.WriteMode
    val cat = new LakeCatalog(spark, Files.createTempDirectory("slbytes-").toString)
    val ckpt = Files.createTempDirectory("slbytes-ckpt-").toString
    val out = Files.createTempDirectory("slbytes-out-").toString
    cat.write(Seq((0L, "seed")).toDF("id", "s"), "ns.b", WriteMode.Overwrite)
    (1L to 7L).foreach(i =>
      cat.write(Seq((i, s"r$i")).toDF("id", "s"), "ns.b", WriteMode.Append))
    val t = cat.table("ns.b")
    // every commit recorded its dir size in the manifest
    val snap = t.latest.get
    val sizes = snap.meta.filter(_._1.startsWith("graft.bytes:")).values.map(_.toLong)
    assert(sizes.size === 8 && sizes.forall(_ > 0), s"per-dir byte sizes missing: ${snap.meta}")
    // a 1-byte cap forces the soft-cap minimum: one commit per batch
    val q = StreamingLakeSource.committedStream(t, maxBytesPerTrigger = Some(1L))
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(0)).start()
    q.processAllAvailable()
    q.stop()
    assert(spark.read.parquet(out).select($"id").as[Long].collect().sorted
      === (0L to 7L).toArray)
    val spans = q.recentProgress.toSeq
      .filter(_.sources.nonEmpty)
      .map(p => (Option(p.sources.head.startOffset).map(_.trim.toLong).getOrElse(0L),
        Option(p.sources.head.endOffset).map(_.trim.toLong).getOrElse(0L)))
      .filter { case (s, e) => e > s }
    assert(spans.size === 8 && spans.forall { case (s, e) => e - s === 1 },
      s"expected 8 single-commit batches, got: $spans")
  }

  test("skipRewriteCommits: mid-stream compaction and MOR DML don't kill the consumer") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.lake.{DmlStrategy, LakeDml, WriteMode}
    val cat = new LakeCatalog(spark, Files.createTempDirectory("slskip-").toString)
    val ckpt = Files.createTempDirectory("slskip-ckpt-").toString
    val out = Files.createTempDirectory("slskip-out-").toString
    cat.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), "ns.s", WriteMode.Overwrite) // v1 seed
    cat.write(Seq((3L, "c")).toDF("id", "s"), "ns.s", WriteMode.Append)               // v2
    val t = cat.table("ns.s")
    def drain(): Unit = {
      val q = StreamingLakeSource.committedStream(t, skipRewriteCommits = true)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    assert(spark.read.parquet(out).count() === 3) // seeding overwrite + append both deliver
    // background compaction mid-stream: skipped, NOT redelivered, NOT fatal
    t.compact(1)                                                                       // v3
    cat.write(Seq((4L, "d")).toDF("id", "s"), "ns.s", WriteMode.Append)                // v4
    drain()
    assert(spark.read.parquet(out).select($"id").as[Long].collect().sorted
      === Array(1L, 2L, 3L, 4L))
    // a MOR delete commit is a rewrite too: skipped (its row changes
    // are not delivered), later appends still flow
    LakeDml.delete(t, $"id" === 1L, strategy = DmlStrategy.MergeOnRead)                // v5
    cat.write(Seq((5L, "e")).toDF("id", "s"), "ns.s", WriteMode.Append)                // v6
    drain()
    assert(spark.read.parquet(out).select($"id").as[Long].collect().sorted
      === Array(1L, 2L, 3L, 4L, 5L))

    // WITHOUT the option, the same history fails loud at the compact commit
    val ckpt2 = Files.createTempDirectory("slskip-ckpt2-").toString
    val out2 = Files.createTempDirectory("slskip-out2-").toString
    val q2 = StreamingLakeSource.committedStream(t)
      .writeStream.format("parquet")
      .option("path", out2).option("checkpointLocation", ckpt2)
      .trigger(Trigger.AvailableNow()).start()
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException](q2.awaitTermination())
    def messages(e: Throwable): Seq[String] =
      if (e == null) Nil else Option(e.getMessage).toSeq ++ messages(e.getCause)
    assert(messages(err).exists(_.contains("data-rewriting")))
  }

  test("mid-stream setPartitionSpec is metadata-only: consumers continue, post-evolution appends flow") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.lake.WriteMode
    val cat = new LakeCatalog(spark, Files.createTempDirectory("slspec-").toString)
    val ckpt = Files.createTempDirectory("slspec-ckpt-").toString
    val out = Files.createTempDirectory("slspec-out-").toString
    cat.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), "ns.sp", WriteMode.Overwrite) // v1
    val t = cat.table("ns.sp")
    def drain(): Unit = {
      val q = StreamingLakeSource.committedStream(t) // NO skip option needed
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    // spec evolution mid-stream: a metadata-only commit, not a rewrite
    t.setPartitionSpec(Seq("bucket(2, id)"))                                           // v2
    cat.write(Seq((3L, "c"), (4L, "d")).toDF("id", "s"), "ns.sp", WriteMode.Append)    // v3
    drain()
    val got = spark.read.parquet(out)
    assert(got.select($"id").as[Long].collect().sorted === Array(1L, 2L, 3L, 4L))
    assert(got.columns.sorted === Array("id", "s")) // hidden column never leaks
  }

  test("streaming sink into a hidden-partitioned table prunes like batch") {
    import graft.lake.LakePredicate._
    val cat = new LakeCatalog(spark, Files.createTempDirectory("slakep-").toString)
    val checkpoint = Files.createTempDirectory("slakep-ckpt-").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = "/root/testdata/sf0.001/events.parquet"
    val schema = spark.read.parquet(path).schema
    val dir = Files.createTempDirectory("slakep-src-")
    Files.createSymbolicLink(dir.resolve("events.parquet"),
      java.nio.file.Paths.get(path))
    val stream = graft.Tables.normalizeTs(
      spark.readStream.schema(schema).parquet(dir.toString))
    val q = StreamingLakeSink.appendStream(stream, cat, "bronze.pe", checkpoint,
      partitionBy = Seq("days(ts)"))
    q.awaitTermination()
    val t = cat.table("bronze.pe")
    assert(t.latest.get.partitionBy === Seq("days(ts)"))
    assert(!t.read(None).columns.exists(_.startsWith("_p_")))
    val cut = java.sql.Timestamp.valueOf("2024-01-05 00:00:00")
    val got = t.scan(Seq(LtEq("ts", cut)))
    val want = t.read(None).where($"ts" <= cut).count()
    assert(got.count() === want && want > 0)
    got.collect()
    assert(got.queryExecution.executedPlan.toString.contains("_p_ts_day"))
  }

  test("change-feed stream: CDC rows flow per commit span; restarts resume by version") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.lake.{DmlStrategy, LakeDml, WriteMode}
    val cat = new LakeCatalog(spark, Files.createTempDirectory("cdf-").toString)
    val ckpt = Files.createTempDirectory("cdf-ckpt-").toString
    val sink = Files.createTempDirectory("cdf-out-").toString
    cat.write(Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "v"),
      "ns.t", WriteMode.Overwrite)
    val t = cat.table("ns.t")
    def drain(): Unit = {
      val q = StreamingLakeSource.changesStream(t)
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain() // v1 overwrite on empty table = inserts
    val first = spark.read.parquet(sink)
    assert(first.count() === 2)
    assert(first.select($"_change_type").distinct().as[String].collect() === Array("insert"))

    // upsert + MOR delete land as CDC rows on the next drain
    t.upsert(Seq((2L, "b2", 200.0), (3L, "c", 30.0)).toDF("id", "name", "v"), Seq("id"))
    LakeDml.delete(t, $"id" === 1L, strategy = DmlStrategy.MergeOnRead)
    drain()
    val rows = spark.read.parquet(sink)
      .select($"id", $"name", $"_change_type", $"_commit_version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(rows === Set(
      (1L, "a", "insert", 1L), (2L, "b", "insert", 1L),
      (2L, "b", "delete", 2L), (2L, "b2", "insert", 2L), (3L, "c", "insert", 2L),
      (1L, "a", "delete", 3L)))
    // no new commits → drains add nothing
    drain()
    assert(spark.read.parquet(sink).count() === 6)
  }

  test("change-feed stream startingVersion: skips expired history; 'latest' delivers only new commits") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.lake.WriteMode
    val cat = new LakeCatalog(spark, Files.createTempDirectory("cdfsv-").toString)
    cat.write(Seq((1L, "a")).toDF("id", "name"), "ns.t", WriteMode.Overwrite) // v1
    val t = cat.table("ns.t")
    t.write(Seq((2L, "b")).toDF("id", "name"), WriteMode.Append)              // v2
    t.write(Seq((3L, "c")).toDF("id", "name"), WriteMode.Append)              // v3
    t.expireSnapshots(2) // v1 gone — a from-0 CDC stream could never start
    def drain(ckpt: String, sink: String, sv: Option[String]): Unit = {
      val q = StreamingLakeSource.changesStream(t, startingVersion = sv)
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // numeric floor: first batch starts AT v3
    val (c1, s1) = (Files.createTempDirectory("cdfsv-c1-").toString,
      Files.createTempDirectory("cdfsv-s1-").toString)
    drain(c1, s1, Some("3"))
    assert(spark.read.parquet(s1).select($"id").as[Long].collect().sorted === Array(3L))
    // 'latest': nothing until a post-start commit arrives
    val (c2, s2) = (Files.createTempDirectory("cdfsv-c2-").toString,
      Files.createTempDirectory("cdfsv-s2-").toString)
    drain(c2, s2, Some("latest"))
    assert(!new java.io.File(s2).exists() || spark.read.parquet(s2).count() === 0)
    t.write(Seq((4L, "d")).toDF("id", "name"), WriteMode.Append)
    drain(c2, s2, Some("latest")) // checkpoint carries the seeded offset
    assert(spark.read.parquet(s2).select($"id").as[Long].collect().sorted === Array(4L))
  }

  test("upsert stream: each batch is one equality-delete commit; last writer wins across restarts") {
    import org.apache.spark.sql.streaming.Trigger
    val cat = new LakeCatalog(spark, Files.createTempDirectory("supsert-").toString)
    val ckpt = Files.createTempDirectory("supsert-ckpt-").toString
    val src = Files.createTempDirectory("supsert-src-")
    def writeBatchFile(n: Int, rows: Seq[(Long, String, Double)]): Unit =
      rows.toDF("id", "name", "v").coalesce(1)
        .write.mode("overwrite").parquet(s"$src/b$n")
    val schema = Seq((0L, "", 0.0)).toDF("id", "name", "v").schema
    def drain(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true").parquet(src.toString)
      val q = StreamingLakeSink.upsertStream(stream, cat, "ns.state", Seq("id"), ckpt)
      q.awaitTermination()
    }
    writeBatchFile(1, Seq((1L, "a", 1.0), (2L, "b", 2.0)))
    drain()
    assert(cat.read("ns.state").count() === 2)
    // second drain: a CDC batch updating id=2 and inserting id=3
    writeBatchFile(2, Seq((2L, "b2", 20.0), (3L, "c", 3.0)))
    drain()
    val t = cat.table("ns.state")
    val rows = t.read(None).orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(rows === Seq((1L, "a", 1.0), (2L, "b2", 20.0), (3L, "c", 3.0)))
    // the update batch landed as an upsert commit (equality delete +
    // append), never rewriting batch 1's files
    val snap = t.latest.get
    assert(snap.op === "upsert" && snap.eqDeletes.nonEmpty)
    // no new files → re-draining is a no-op (checkpoint tracks offsets)
    drain()
    assert(t.latest.get.version === snap.version)
  }
}
