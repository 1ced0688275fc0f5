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
}
