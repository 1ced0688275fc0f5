package graft.streaming

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.{Tables, TestSpark}

/** State-store behavior of the stateful streaming operators under
  * MULTI-batch replay — the shape the one-shot AvailableNow queries
  * cannot show (a single micro-batch never advances its own
  * watermark, so eviction only appears across batches). Each test
  * splits the events fixture into time-ordered files consumed one per
  * trigger and asserts from the query's own state-operator metrics
  * that (a) watermark eviction actually removed state rows and (b)
  * the final state footprint is bounded well below the stream's
  * row count — the property that keeps these operators O(horizon)
  * instead of O(history) on an unbounded feed.
  */
class StreamingStateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Events at sf0.001 (µs-normalized), sorted by ts, written as `n`
    * single-file slices whose modification times increase with event
    * time — FileStreamSource with maxFilesPerTrigger=1 then replays
    * them as `n` micro-batches in event-time order.
    */
  private def splitEvents(n: Int): (Path, DataFrame) = {
    val ev = Tables(spark, "/root/testdata/sf0.001").events
    val total = ev.count()
    val per = (total + n - 1) / n
    val ranked = ev.withColumn("_rk",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy($"ts", $"event_id")))
    val dir = Files.createTempDirectory("stream-slices-")
    (0 until n).foreach { i =>
      val scratch = Files.createTempDirectory("stream-slice-one-")
      ranked.where($"_rk" > i * per && $"_rk" <= (i + 1) * per).drop("_rk")
        .coalesce(1).write.mode("overwrite").parquet(scratch.toString)
      val part = Files.list(scratch).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      val dst = dir.resolve(f"slice-$i%02d.parquet")
      Files.move(part, dst)
      dst.toFile.setLastModified(1700000000000L + i * 60000L)
    }
    (dir, ev)
  }

  private def stateMetrics(q: org.apache.spark.sql.streaming.StreamingQuery)
      : (Long, Long, Int) = {
    val progs = q.recentProgress.toSeq
    val ops = progs.flatMap(_.stateOperators.toSeq)
    val removed = ops.map(_.numRowsRemoved).sum
    val finalTotal = progs.lastOption.map(_.stateOperators.toSeq.map(_.numRowsTotal).sum)
      .getOrElse(0L)
    (removed, finalTotal, progs.size)
  }

  test("stream-stream interval join evicts out-of-interval state across micro-batches") {
    val (dir, ev) = splitEvents(6)
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "4")
    val schema = s.read.parquet(dir.toString).schema
    val src = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val purchases = src.where($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"), $"ts".as("p_ts"))
      .withWatermark("p_ts", "10 minutes")
    val clicks = src.where($"event_type" === "click")
      .select($"user_id".as("c_user_id"), $"event_id".as("click_id"), $"ts".as("c_ts"))
      .withWatermark("c_ts", "10 minutes")
    val joined = purchases.join(clicks,
      $"user_id" === $"c_user_id" &&
        $"c_ts" >= $"p_ts" - expr("INTERVAL 1 HOUR") && $"c_ts" <= $"p_ts")
      .select($"user_id", $"purchase_id", $"click_id", $"p_ts", $"c_ts")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_state")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val (removed, finalTotal, batches) = stateMetrics(q)
    assert(batches >= 6, s"expected one micro-batch per slice, saw $batches")
    // eviction actually happened: buffered rows outside the join
    // interval + watermark were removed from the state store mid-run
    assert(removed > 0, "no state rows were ever evicted — state grows with history")
    // bounded footprint: final state holds a small tail of the stream,
    // not both filtered streams in full
    val streamed = ev.where($"event_type".isin("purchase", "click")).count()
    assert(finalTotal < streamed,
      s"final state ($finalTotal) holds the whole joined input ($streamed)")
    // correctness across batch boundaries: in-order replay loses
    // nothing, so the streamed result equals the batch interval join
    val got = s.table("ssj_state")
    val want = EventsWindows.intervalJoinBatch(ev)
    assert(got.count() === want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("session windows finalize and evict closed sessions across micro-batches") {
    val (dir, ev) = splitEvents(6)
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "4")
    val schema = s.read.parquet(dir.toString).schema
    val src = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val agg = src.withWatermark("ts", "10 minutes")
      .groupBy(session_window($"ts", "30 minutes").as("w"), $"user_id")
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id", $"w.start".as("t_start"), $"w.end".as("t_end"), $"n_events")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("sess_state")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val (removed, finalTotal, batches) = stateMetrics(q)
    assert(batches >= 6)
    assert(removed > 0, "no session state evicted — closed sessions never finalize")
    val distinctUsers = ev.select($"user_id").distinct().count()
    // bounded: state tracks open sessions (≈ users with recent
    // activity), never the full session history
    val emitted = s.table("sess_state")
    assert(finalTotal < emitted.count() + distinctUsers,
      s"state ($finalTotal) retains closed sessions")
    // every emitted (finalized) session matches the batch
    // sessionization: same user, same first-event start, same event
    // count (session_window's `end` is last-event + gap, while the
    // batch answer's t_end is MAX(ts) — ends are compared shifted)
    val batch = EventsWindows.sessionizeBatch(ev)
      .select($"user_id", $"t_start", $"n_events")
    assert(emitted.select($"user_id", $"t_start", $"n_events")
      .exceptAll(batch).isEmpty,
      "streaming emitted a session the batch gaps-and-islands answer lacks")
    assert(emitted.count() > 0)
  }
}
