package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.functions.{BitmapFunctions => BF}
import graft.lake.{LakePredicate, LakeTable}

/** Streaming maintenance of exact distinct-user SEGMENTS: a lake table
  * keyed (event_type, day) whose `bm` column is the Roaring bitmap of
  * that slice's distinct users, kept up to date from the event
  * stream. The segments are the queryable asset — DAU is
  * `bitmap64_count(bm)`, rolling windows OR-merge a few rows
  * ([[graft.queries.AnalyticsQueries.rollingDistinct]]'s shape), and
  * audience overlap is `bitmap64_and_count` — all WITHOUT revisiting
  * raw events.
  *
  * Per trigger: the micro-batch aggregates to its own per-(type, day)
  * bitmaps, the store is read back ONLY for the touched days (the
  * day `In` predicate prunes on declared footer stats; a batch
  * touches few days by arrival locality), the two generations
  * OR-merge, and ONE equality-delete upsert lands the refreshed
  * segments — cost tracks the batch, never the store. foreachBatch
  * is at-least-once, so the upsert carries a batch marker in commit
  * meta and a replayed batch is a no-op (the spec calls the merge
  * twice to prove it).
  */
object BitmapSegments {

  /** Compaction-carried so a bin-pack between upsert and checkpoint
    * cannot erase replay protection (same argument as
    * [[IncrementalDedup.BatchKey]]).
    */
  private val BatchKey = LakeTable.CarryMetaPrefix + "segments.batch"

  /** OR-merge one micro-batch into the segment store; idempotent per
    * batchId. Factored out of foreachBatch so the at-least-once path
    * is directly testable.
    */
  private[ops] def mergeBatch(spark: SparkSession, segTbl: LakeTable,
                              batch: DataFrame, batchId: Long): Unit = {
    val done = segTbl.latest.flatMap(_.meta.get(BatchKey)).exists(_.toLong >= batchId)
    if (done) return
    val bseg = batch
      .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
      .groupBy(col("event_type"), col("day"))
      .agg(BF.bitmap64_agg(col("user_id")).as("bm"))
      .localCheckpoint() // touched-day collect + merge read the same frame
    val marker = Map(BatchKey -> batchId.toString)
    if (segTbl.latest.isEmpty) {
      // first generation: declare day stats so later triggers' In
      // predicates prune the read to touched files
      segTbl.write(bseg, graft.lake.WriteMode.Overwrite,
        statsBy = Seq("day"), meta = marker)
      return
    }
    // tiny by construction: a batch's distinct days
    val touchedDays = bseg.select(col("day")).distinct()
      .collect().map(_.getDate(0)).toSeq
    if (touchedDays.isEmpty) return
    val existing = segTbl.scan(Seq(LakePredicate.In("day", touchedDays)))
    val merged = bseg.unionByName(existing)
      .groupBy(col("event_type"), col("day"))
      .agg(BF.bitmap64_or_agg(col("bm")).as("bm"))
    segTbl.upsert(merged, keys = Seq("event_type", "day"), meta = marker)
  }

  /** Drain the event table's committed-commit stream into the segment
    * store (AvailableNow; checkpointed, so later calls resume past
    * already-folded commits).
    */
  def maintain(spark: SparkSession, eventsTbl: LakeTable, segTbl: LakeTable,
               checkpoint: String, maxCommitsPerTrigger: Option[Int] = Some(1)): Unit = {
    val q = graft.streaming.StreamingLakeSource
      .committedStream(eventsTbl, maxCommitsPerTrigger = maxCommitsPerTrigger)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(spark, segTbl, batch, batchId)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** The store, readable: (event_type, day, dau) from segment
    * cardinalities alone.
    */
  def dailyCounts(segTbl: LakeTable): DataFrame =
    segTbl.read()
      .select(col("event_type"), col("day"),
        BF.bitmap64_count(col("bm")).as("dau"))
      .orderBy(col("event_type"), col("day"))
}
