package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.Tables

class EventsWindowsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def eventsPath = s"$dir/events.parquet"

  test("streaming helpers do not mutate the caller's session conf") {
    // the stream-tuned shuffle-partition count (and the nanos legacy
    // conf) must live in the CLONED session only — a leak here would
    // silently re-plan every subsequent batch query in the session
    val before = (spark.conf.get("spark.sql.shuffle.partitions"),
      spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong"))
    EventsWindows.tumblingStreaming(spark, eventsPath).collect()
    val after = (spark.conf.get("spark.sql.shuffle.partitions"),
      spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong"))
    assert(after === before)
    assert(before._1 !== "8") // i.e. the stream-tuned value never leaked
  }

  test("streaming tumbling equals batch tumbling") {
    val batch = EventsWindows.tumblingBatch(Tables(spark, dir).events)
      .orderBy($"ws", $"event_type").collect().toSeq
    val stream = EventsWindows.tumblingStreaming(spark, eventsPath)
      .orderBy($"ws", $"event_type").collect().toSeq
    assert(stream === batch)
  }

  test("streaming session windows emit a subset consistent with batch islands") {
    val stream = EventsWindows.sessionWindowStreaming(spark, eventsPath)
    val batch = EventsWindows.sessionizeBatch(Tables(spark, dir).events)
    val got = stream.select($"user_id", $"n_events").as[(Long, Long)].collect()
    assert(got.nonEmpty)
    // every emitted (user, n_events) session exists in the batch answer
    val want = batch.select($"user_id", $"n_events").as[(Long, Long)]
      .collect().groupBy(identity).view.mapValues(_.length).toMap
    val gotCounts = got.groupBy(identity).view.mapValues(_.length).toMap
    gotCounts.foreach { case (k, n) =>
      assert(want.getOrElse(k, 0) >= n, s"session $k not in batch answer")
    }
  }

  test("mapGroupsWithState produces total per-user counts") {
    val res = EventsWindows.statefulUserCounts(spark, eventsPath)
    val got = res.select($"user_id", $"n_events").as[(Long, Long)]
      .collect().groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).max }
    val want = Tables(spark, dir).events.groupBy($"user_id").count()
      .as[(Long, Long)].collect().toMap
    assert(got === want)
  }

  test("transformWithState equals mapGroupsWithState per-user totals") {
    def finalCounts(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.select($"user_id", $"n_events").as[(Long, Long)]
        .collect().groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).max }
    val tws = finalCounts(EventsWindows.statefulUserCountsTws(spark, eventsPath))
    val mgws = finalCounts(EventsWindows.statefulUserCounts(spark, eventsPath))
    val want = Tables(spark, dir).events.groupBy($"user_id").count()
      .as[(Long, Long)].collect().toMap
    assert(tws === mgws) // the two custom-state APIs agree
    assert(tws === want) // and both match the batch ground truth
  }

  test("streaming dedup drops injected duplicate files within the watermark") {
    // stream dir = the fixture file + a duplicated copy: every event
    // arrives twice in the same replay
    val d = java.nio.file.Files.createTempDirectory("graft-dup-stream-")
    val src = java.nio.file.Paths.get(eventsPath)
    java.nio.file.Files.createSymbolicLink(d.resolve("a.parquet"), src.toAbsolutePath)
    java.nio.file.Files.copy(src, d.resolve("b.parquet"))
    val got = EventsWindows.streamingDedup(spark, d.toString)
      .as[(String, Long)].collect().toMap
    val want = Tables(spark, dir).events
      .groupBy($"event_type").agg(countDistinct($"event_id").as("n"))
      .as[(String, Long)].collect().toMap
    assert(got === want) // doubled input, deduped output
  }

  test("stream-stream interval join equals the batch interval join") {
    val stream = EventsWindows.streamStreamJoin(spark, eventsPath)
      .orderBy($"user_id", $"purchase_id", $"click_id").collect().toSeq
    val batch = EventsWindows.intervalJoinBatch(Tables(spark, dir).events)
      .orderBy($"user_id", $"purchase_id", $"click_id").collect().toSeq
    assert(stream.nonEmpty)
    assert(stream === batch)
  }

  test("stream-stream LEFT OUTER join equals the batch left outer join") {
    val stream = EventsWindows.streamStreamLeftOuterJoin(spark, eventsPath)
      .orderBy($"user_id", $"purchase_id", $"click_id").collect().toSeq
    val batch = EventsWindows.leftOuterIntervalBatch(Tables(spark, dir).events)
      .orderBy($"user_id", $"purchase_id", $"click_id").collect().toSeq
    assert(stream.nonEmpty)
    // the deterministic-eviction cutoff means outer results are NOT a
    // subset: every unmatched purchase must have emitted its null row
    assert(stream.exists(_.isNullAt(3)), "expected at least one unmatched purchase")
    assert(stream === batch)
  }

  test("sessionization invariant: session event counts sum to total events") {
    val sess = EventsWindows.sessionizeBatch(Tables(spark, dir).events)
    val total = Tables(spark, dir).events.count()
    assert(sess.agg(sum($"n_events")).head.getLong(0) === total)
    // sessions are disjoint, ordered, and gap-respecting per user
    val bad = sess.as("a").join(sess.as("b"),
      $"a.user_id" === $"b.user_id" && $"a.session_id" < $"b.session_id" &&
        $"a.t_end" >= $"b.t_start").count()
    assert(bad === 0)
  }
}
