package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.lake.{LakeCatalog, WriteMode}

/** Structured Streaming → lake-table sink via `foreachBatch`: each
  * micro-batch appends one atomic snapshot, so the lake table is the
  * streaming sink with the same isolation guarantees as batch writes —
  * the production shape of the reference's daily incremental load
  * (bronze append) driven by a stream instead of a cron.
  *
  * Exactly-once note: the lake commit is atomic per batch, and batch
  * replays after a failure re-commit the same rows — combine with an
  * idempotent downstream (the medallion silver dedup) or dedup on a
  * batch-id column for end-to-end exactly-once, which is precisely the
  * semantics the reference's overwrite-based pipeline provides
  * (SURVEY.md §2.9 "exactly-once sink").
  */
object StreamingLakeSink {

  /** Start a stream writing every micro-batch to `ident` (append).
    * With `Trigger.AvailableNow` this drains the source and stops —
    * the incremental batch-replay mode. `partitionBy` takes the lake
    * layer's partition specs, including hidden transforms
    * (`days(ts)`) — the streaming table then prunes like any batch
    * table.
    */
  def appendStream(stream: DataFrame, catalog: LakeCatalog, ident: String,
                   checkpointDir: String,
                   trigger: Trigger = Trigger.AvailableNow(),
                   partitionBy: Seq[String] = Nil): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        catalog.write(
          batch.withColumn("_batch_id",
            org.apache.spark.sql.functions.lit(batchId)),
          ident, WriteMode.Append, partitionBy = partitionBy)
        ()
      }
      .start()

  /** Start a CDC/upsert stream: each micro-batch lands as ONE
    * equality-delete upsert commit ([[graft.lake.LakeTable.upsert]]) —
    * new rows append, older rows with the same `keys` are retired by a
    * key-valued delete file, and NO existing data is read or
    * rewritten. This is the Flink→Iceberg upsert-mode sink shape: the
    * only viable way to maintain a continuously-updated 100 TB table
    * from a change stream (a per-batch MERGE would scan the table
    * every trigger).
    *
    * Rows are deduplicated on `keys` within each batch (the upsert
    * contract); a batch replayed after a failure re-upserts the same
    * rows — identical values land, so the table converges to the same
    * state (the extra commit is folded by the next `compact()`).
    */
  def upsertStream(stream: DataFrame, catalog: LakeCatalog, ident: String,
                   keys: Seq[String], checkpointDir: String,
                   trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        catalog.table(ident).upsert(
          batch.dropDuplicates(keys),
          keys,
          meta = Map("graft.streamBatchId" -> batchId.toString))
        ()
      }
      .start()
}
