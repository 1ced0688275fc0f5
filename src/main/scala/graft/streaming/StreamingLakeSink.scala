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
  * Exactly-once: foreachBatch is at-least-once, so the append path
  * records a per-sink batch marker in the commit meta (under
  * [[graft.lake.LakeTable.CarryMetaPrefix]], which compaction carries
  * forward) and a replayed batch whose marker is already committed is
  * a detected no-op — the Delta `txn`/(appId, version) idempotence
  * shape, with the checkpoint directory as the app identity so two
  * independent sinks on one table cannot mistake each other's
  * markers. The marker lookup walks manifests newest-first
  * ([[graft.lake.LakeTable.latestMeta]]), so appends interleaved from
  * OTHER writers between a batch's commit and its replay do not hide
  * the marker. The upsert path needs none of this: re-upserting
  * identical values converges by construction.
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
                   partitionBy: Seq[String] = Nil): StreamingQuery = {
    val marker = markerKey(checkpointDir)
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatchOnce(catalog, ident, batch, batchId, marker, partitionBy)
      }
      .start()
  }

  /** Marker meta key for one sink instance: the checkpoint directory
    * IS the sink's durable identity (same checkpoint ⇒ same batchId
    * sequence), so its hash scopes the marker exactly as Delta's
    * `txn.appId` does.
    */
  private[streaming] def markerKey(checkpointDir: String): String =
    graft.lake.LakeTable.CarryMetaPrefix + "sink." +
      java.security.MessageDigest.getInstance("SHA-1")
        .digest(checkpointDir.getBytes("UTF-8"))
        .take(6).map(b => f"$b%02x").mkString

  /** One micro-batch append, exactly once per (marker, batchId) —
    * factored out of foreachBatch so the at-least-once replay path is
    * directly testable.
    */
  private[streaming] def appendBatchOnce(catalog: LakeCatalog, ident: String,
                                         batch: DataFrame, batchId: Long,
                                         marker: String,
                                         partitionBy: Seq[String]): Unit = {
    val t = catalog.table(ident)
    val done = t.latest.isDefined &&
      t.latestMeta(marker).exists(_.toLong >= batchId)
    if (!done)
      catalog.write(
        batch.withColumn("_batch_id",
          org.apache.spark.sql.functions.lit(batchId)),
        ident, WriteMode.Append, partitionBy = partitionBy,
        meta = Map(marker -> batchId.toString))
    ()
  }

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
