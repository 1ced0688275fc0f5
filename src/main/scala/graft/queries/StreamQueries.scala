package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.sources.CsvSource
import graft.streaming.EventsWindows

/** Streaming-semantics queries (batch + true Structured Streaming) and
  * the CSV source roundtrip.
  */
object StreamQueries {

  /** Tumbling 1h event-time windows, batch plan. */
  def tumbling(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    EventsWindows.tumblingBatch(Tables(spark, dir).events)
      .orderBy($"ws", $"event_type")
  }

  /** Same aggregation executed as a real Structured Streaming job
    * (parquet stream source, AvailableNow, complete-mode memory sink) —
    * shares the batch oracle, proving stream/batch result parity.
    */
  def tumblingStreaming(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    EventsWindows.tumblingStreaming(spark, s"$dir/events.parquet")
      .orderBy($"ws", $"event_type")
  }

  /** Sliding 1h windows hopping every 30min: each event counts in two
    * overlapping windows (oracle: union of the two shifted buckets).
    */
  def sliding(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    EventsWindows.slidingBatch(Tables(spark, dir).events)
      .orderBy($"ws", $"event_type")
  }

  /** Sessionization (30-min inactivity gap), gaps-and-islands batch plan. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    EventsWindows.sessionizeBatch(Tables(spark, dir).events)
      .orderBy($"user_id", $"session_id")
  }

  /** Streaming exact dedup with watermark-bounded state — counts per
    * type after `dropDuplicatesWithinWatermark` (event_ids are unique
    * in the fixture, so the oracle is the distinct count; the
    * duplicate-dropping behavior itself is asserted in
    * EventsWindowsSpec with injected duplicate files).
    */
  def streamingDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    EventsWindows.streamingDedup(spark, s"$dir/events.parquet")
      .orderBy($"event_type")
  }

  /** Watermarked stream-stream interval join (purchases × preceding-
    * hour clicks per user), AvailableNow to completion; inner-join
    * matches emit immediately, so the result equals the batch interval
    * join the DuckDB oracle states.
    */
  def streamStreamJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    EventsWindows.streamStreamJoin(spark, s"$dir/events.parquet")
      .orderBy($"user_id", $"purchase_id", $"click_id")
  }

  /** CSV write → read roundtrip with explicit schema (reference S7/S8). */
  def csvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val region = Tables(spark, dir).region
    val tmp = LakeQueries.scratchDir("graft-csv-").toString + "/region"
    CsvSource.write(region, tmp)
    CsvSource.read(spark, tmp, schema = Some(region.schema))
      .orderBy($"r_regionkey")
  }
}
