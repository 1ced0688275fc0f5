package graft.streaming

import java.util.UUID
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import graft.SqlCompat._

/** Streaming slice over the `events` table (SURVEY.md §2.9): the
  * reference's semantics are batch-incremental (daily watermark
  * extract ≈ 24h tumbling processing-time window); this module carries
  * the Structured-Streaming flavor — tumbling/session event-time
  * windows with watermarks, plus a `mapGroupsWithState` custom-state
  * example — and the batch equivalents used for oracle checking.
  *
  * Scale notes: windowed aggregations shuffle once on (window, key);
  * state store size is bounded by watermark retention; `AvailableNow`
  * gives incremental batch replay of a growing directory — the exact
  * production shape of the reference's daily incremental job.
  */
object EventsWindows {

  /** Batch tumbling window aggregation (same `window()` expression the
    * streaming variant uses — Spark plans both identically).
    */
  def tumblingBatch(events: DataFrame, width: String = "1 hour"): DataFrame =
    slidingBatch(events, width, width) // tumbling = hop size equal to width

  /** Sliding (hopping) windows: each event lands in window/slide
    * overlapping buckets (Spark expands rows window/slide-fold before
    * the aggregation — the shuffle carries the expansion, so keep the
    * overlap factor small at scale). Same expression works batch and
    * streaming.
    */
  def slidingBatch(events: DataFrame, width: String = "1 hour",
                   slide: String = "30 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sumd(col("value")).as("sum_value"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"), col("sum_value"))

  /** Batch sessionization via the gaps-and-islands pattern: a session
    * breaks after `gapMs` of inactivity. Single shuffle on user_id,
    * two window passes.
    */
  def sessionizeBatch(events: DataFrame, gapMs: Long = 30 * 60 * 1000L): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_ms", lag(unix_millis(col("ts")), 1).over(byUser))
      .withColumn("brk",
        when(col("prev_ms").isNull || (unix_millis(col("ts")) - col("prev_ms")) > gapMs, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum(col("brk")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("t_start"), max(col("ts")).as("t_end"))
  }

  /** True Structured Streaming tumbling aggregation: parquet stream
    * source → event-time window → complete-mode memory sink, driven to
    * completion with `Trigger.AvailableNow`. Returns the final table —
    * identical content to [[tumblingBatch]] over the same files.
    */
  /** The file-stream source requires a directory; a bare parquet file
    * is exposed through a symlink in a temp dir (no data copy).
    */
  private def asStreamDir(parquetPath: String): String = {
    val p = java.nio.file.Paths.get(parquetPath)
    if (java.nio.file.Files.isDirectory(p)) parquetPath
    else {
      val d = java.nio.file.Files.createTempDirectory("graft-stream-src-")
      java.nio.file.Files.createSymbolicLink(d.resolve(p.getFileName), p.toAbsolutePath)
      d.toString
    }
  }

  /** Run a streaming DataFrame to completion into a memory sink and
    * return the result table (shared driver for the AvailableNow
    * variants below).
    */
  private def runToMemory(spark: SparkSession, agg: DataFrame, prefix: String,
                          mode: OutputMode): DataFrame = {
    val name = prefix + UUID.randomUUID().toString.replace("-", "")
    val q = agg.writeStream
      .outputMode(mode)
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** Nanos-parquet events as a streaming source (schema + µs ts).
    *
    * Runs in a cloned session with a smaller shuffle-partition count:
    * stateful operators create one state store per shuffle partition
    * PER micro-batch (provider init, maintenance thread, snapshot
    * files), so a 1-hour-window aggregation over a bounded replay pays
    * fixed state overhead × partitions. 8 keeps full parallelism for
    * the bounded key space (24 windows × 5 event types) at a quarter
    * of the state-store overhead; a production deployment with a wide
    * key space would raise it back.
    *
    * `newSession()` gives the clone its OWN `SessionState`/`SQLConf`
    * (sharing only the `SparkContext`), so these sets never touch the
    * caller's session — batch queries keep their 32 shuffle
    * partitions (asserted by `EventsWindowsSpec`'s conf-isolation
    * test).
    */
  private def streamSession(spark: SparkSession): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "8")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s
  }

  /** One events stream inside an existing (cloned) session — used
    * directly when a query needs TWO sources in the SAME session
    * (stream-stream joins can't cross sessions).
    */
  private def eventsStreamIn(s: SparkSession, parquetPath: String): DataFrame = {
    // batch-infer the physical schema (nanos fixtures load ts as INT64
    // under the legacy conf; micros-NTZ fixtures as TIMESTAMP_NTZ),
    // then let normalizeTs dispatch — same rule as the batch loader, so
    // stream/batch parity can't drift across fixture regenerations
    val raw = s.read.parquet(parquetPath).schema
    graft.Tables.normalizeTs(
      s.readStream.schema(raw).parquet(asStreamDir(parquetPath)))
  }

  private def eventsStream(spark: SparkSession, parquetPath: String): DataFrame =
    eventsStreamIn(streamSession(spark), parquetPath)

  def tumblingStreaming(spark: SparkSession, parquetPath: String,
                        width: String = "1 hour"): DataFrame = {
    val agg = tumblingBatch(eventsStream(spark, parquetPath), width)
    runToMemory(agg.sparkSession, agg, "graft_stream_", OutputMode.Complete())
  }

  /** Streaming per-window top-k THROUGH THE CUSTOM AGGREGATE:
    * [[graft.functions.TopKByScore]] (a `TypedImperativeAggregate`)
    * runs inside the streaming aggregation, its O(k) heap serialized
    * into the state store between micro-batches exactly like Spark's
    * own sketch aggregates — proof the engine's custom aggregates
    * compose with Structured Streaming state, not just batch plans.
    * Per (1h window × event_type): the k highest-valued events. State
    * per group is the k-entry heap, NOT the window's rows — the
    * bounded-state requirement for continuous leaderboards over an
    * unbounded stream.
    */
  def topkStreaming(spark: SparkSession, parquetPath: String,
                    width: String = "1 hour", k: Int = 3): DataFrame = {
    val agg = eventsStream(spark, parquetPath)
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(graft.functions.TopKFunctions.topk_by(col("value"), col("event_id"), k).as("top"))
      .select(col("w.start").as("ws"), col("event_type"), posexplode(col("top")))
      .select(col("ws"), col("event_type"),
        (col("pos") + 1).cast("long").as("rank"),
        col("col.score").as("value"), col("col.item").as("event_id"))
    runToMemory(agg.sparkSession, agg, "graft_topk_", OutputMode.Complete())
  }

  /** Streaming session windows (`session_window` + watermark, append
    * mode). With AvailableNow the final in-flight sessions stay open
    * (watermark semantics), so callers compare emitted rows as a subset
    * of the batch answer.
    */
  def sessionWindowStreaming(spark: SparkSession, parquetPath: String,
                             gap: String = "30 minutes"): DataFrame = {
    val agg = eventsStream(spark, parquetPath)
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("t_start"),
        col("w.end").as("t_end"), col("n_events"))
    // the memory sink registers its table in the (cloned) session that
    // starts the query — resolve the result there
    runToMemory(agg.sparkSession, agg, "graft_sess_", OutputMode.Append())
  }

  /** Streaming exact dedup with bounded state
    * (`dropDuplicatesWithinWatermark`): duplicate event_ids arriving
    * within the watermark horizon are dropped, and state for ids older
    * than the watermark is evicted — the ONLY way streaming dedup
    * stays O(horizon) instead of O(stream history), which is the core
    * requirement for dedup over an unbounded training-data feed.
    */
  def streamingDedup(spark: SparkSession, parquetPath: String,
                     horizon: String = "30 minutes"): DataFrame = {
    val deduped = eventsStream(spark, parquetPath)
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    runToMemory(deduped.sparkSession, deduped, "graft_dedup_", OutputMode.Complete())
  }

  /** Watermarked stream-stream interval join: each purchase joins
    * click events of the same user within the preceding `lookback`.
    * Both sides carry watermarks and the join condition bounds event
    * time on both ends, so Spark evicts join state outside the
    * interval — the state-bounded shape of stream-stream joins at
    * scale (an unbounded-time condition would buffer both streams
    * forever).
    */
  def streamStreamJoin(spark: SparkSession, parquetPath: String,
                       lookback: String = "1 hour"): DataFrame = {
    val s = streamSession(spark)
    val purchases = eventsStreamIn(s, parquetPath)
      .where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "10 minutes")
    val clicks = eventsStreamIn(s, parquetPath) // second source, same session
      .where(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("event_id").as("click_id"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "10 minutes")
    val joined = purchases.join(clicks,
      col("user_id") === col("c_user_id") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $lookback") &&
        col("c_ts") <= col("p_ts"))
      .select(col("user_id"), col("purchase_id"), col("click_id"), col("p_ts"), col("c_ts"))
    runToMemory(joined.sparkSession, joined, "graft_ssj_", OutputMode.Append())
  }

  /** Watermarked stream-stream LEFT OUTER interval join: purchases
    * with no click in the preceding `lookback` emit with null click
    * columns — but only when their join state is EVICTED (outer
    * results cannot emit while a match could still arrive). The
    * deterministic-completion trick: the watermark is assigned on the
    * UNFILTERED stream (so the final watermark reaches
    * max(ts) − delay), and both sides then restrict to
    * `ts <= max(ts) − holdback` with holdback > delay — every
    * buffered row's eviction bound is STRICTLY below the final
    * watermark, so AvailableNow's closing no-data batches flush every
    * outer result. Without that ordering the tail of the stream never
    * evicts and outer rows are silently withheld — the classic
    * stream-stream outer-join gotcha.
    */
  def streamStreamLeftOuterJoin(spark: SparkSession, parquetPath: String,
                                lookback: String = "1 hour",
                                delay: String = "10 minutes",
                                holdbackMinutes: Int = 20): DataFrame = {
    val s = streamSession(spark)
    // µs-exact cutoff (Timestamp.getTime would truncate to ms and
    // diverge from the oracle's max(ts) - INTERVAL arithmetic)
    val maxTs = graft.Tables.normalizeTs(s.read.parquet(parquetPath))
      .agg(max(col("ts"))).head.getTimestamp(0)
    val cutoff = java.sql.Timestamp.from(
      maxTs.toInstant.minus(java.time.Duration.ofMinutes(holdbackMinutes.toLong)))
    // each side keeps its post-cutoff tail flowing as SENTINEL rows
    // (negative user ids, never joinable): Catalyst pushes filters
    // below the watermark node, so a plain `ts <= cutoff` filter would
    // cap the observed event time at the last surviving row and the
    // final watermark would strand the newest real row's outer result.
    // Sentinels carry the true max(ts) through the watermark, then
    // fall out after the join.
    def side(tpe: String, sentinelUser: Long) =
      eventsStreamIn(s, parquetPath)
        .withWatermark("ts", delay)
        .where(col("event_type") === tpe && col("ts") <= lit(cutoff) ||
          col("ts") > lit(cutoff))
        .select(
          when(col("ts") > lit(cutoff), lit(sentinelUser))
            .otherwise(col("user_id")).as("user_id"),
          col("event_id"), col("ts"))
    val purchases = side("purchase", -1L)
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    val clicks = side("click", -2L)
      .select(col("user_id").as("c_user_id"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
    val joined = purchases.join(clicks,
      col("user_id") === col("c_user_id") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $lookback") &&
        col("c_ts") <= col("p_ts"),
      "left_outer")
      .where(col("user_id") >= 0L) // drop watermark sentinels
      .select(col("user_id"), col("purchase_id"), col("p_ts"),
        col("click_id"), col("c_ts"))
    runToMemory(joined.sparkSession, joined, "graft_ssoj_", OutputMode.Append())
  }

  /** Batch equivalent of [[streamStreamLeftOuterJoin]] (same cutoff +
    * interval semantics) — the parity oracle.
    */
  def leftOuterIntervalBatch(events: DataFrame, lookback: String = "1 hour",
                             holdbackMinutes: Int = 20): DataFrame = {
    val maxTs = events.agg(max(col("ts"))).head.getTimestamp(0)
    val cutoff = java.sql.Timestamp.from(
      maxTs.toInstant.minus(java.time.Duration.ofMinutes(holdbackMinutes.toLong)))
    val purchases = events
      .where(col("event_type") === "purchase" && col("ts") <= lit(cutoff))
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    val clicks = events
      .where(col("event_type") === "click" && col("ts") <= lit(cutoff))
      .select(col("user_id").as("c_user_id"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
    purchases.join(clicks,
      col("user_id") === col("c_user_id") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $lookback") &&
        col("c_ts") <= col("p_ts"),
      "left_outer")
      .select(col("user_id"), col("purchase_id"), col("p_ts"),
        col("click_id"), col("c_ts"))
  }

  /** Batch equivalent of [[streamStreamJoin]] (same interval
    * semantics) — the parity oracle.
    */
  def intervalJoinBatch(events: DataFrame, lookback: String = "1 hour"): DataFrame = {
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    val clicks = events.where(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("event_id").as("click_id"), col("ts").as("c_ts"))
    purchases.join(clicks,
      col("user_id") === col("c_user_id") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $lookback") &&
        col("c_ts") <= col("p_ts"))
      .select(col("user_id"), col("purchase_id"), col("click_id"), col("p_ts"), col("c_ts"))
  }

  final case class UserEvent(user_id: Long, event_type: String)
  final case class UserCount(user_id: Long, n_events: Long)

  /** Per-user running counts via `transformWithState` — Spark 4's
    * successor to mapGroupsWithState (typed per-key state variables
    * with TTL support, RocksDB-backed, schema-evolvable). Same
    * semantics as [[statefulUserCounts]], asserted equal in the spec;
    * the TTLConfig.NONE ValueState is the simplest of the state
    * shapes (Value/List/Map) the handle exposes.
    */
  def statefulUserCountsTws(spark: SparkSession, parquetPath: String): DataFrame = {
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig}
    import org.apache.spark.sql.{Encoder, Encoders}
    val s = streamSession(spark)
    // transformWithState requires the RocksDB state store provider
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val raw = eventsStreamIn(s, parquetPath)
    import s.implicits._
    class CountProcessor extends org.apache.spark.sql.streaming.StatefulProcessor[Long, UserEvent, UserCount] {
      @transient private var count: org.apache.spark.sql.streaming.ValueState[Long] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        count = getHandle.getValueState[Long]("count",
          Encoders.scalaLong, TTLConfig.NONE)
      override def handleInputRows(key: Long, rows: Iterator[UserEvent],
          timers: org.apache.spark.sql.streaming.TimerValues): Iterator[UserCount] = {
        val total = (if (count.exists()) count.get() else 0L) + rows.size
        count.update(total)
        Iterator(UserCount(key, total))
      }
    }
    val counts = raw.select($"user_id", $"event_type").as[UserEvent]
      .groupByKey(_.user_id)
      .transformWithState(new CountProcessor, TimeMode.None(), OutputMode.Update())
    runToMemory(counts.sparkSession, counts.toDF(), "graft_tws_", OutputMode.Update())
  }

  /** Custom arbitrary state: per-user running event counts via
    * `mapGroupsWithState` — the KeyValueGroupedDataset stateful surface
    * (SURVEY.md §2.9's "custom state" requirement).
    */
  def statefulUserCounts(spark: SparkSession, parquetPath: String): DataFrame = {
    import spark.implicits._
    val raw = eventsStream(spark, parquetPath)
    val updateFn: (Long, Iterator[UserEvent], GroupState[Long]) => UserCount =
      (uid, evs, state) => {
        val total = state.getOption.getOrElse(0L) + evs.size
        state.update(total)
        UserCount(uid, total)
      }
    val counts = raw.select($"user_id", $"event_type").as[UserEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(updateFn)
    runToMemory(counts.sparkSession, counts.toDF(), "graft_state_", OutputMode.Update())
  }
}
