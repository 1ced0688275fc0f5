package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.lake.LakeTable

/** Lake table as a STREAMING SOURCE: every committed append lands its
  * files under a fresh immutable `data/<uuid>/` dir, so Spark's file
  * stream source pointed at the `data` dir glob discovers exactly the new
  * commits' files on each trigger — incremental consumption of an
  * append-only lake table with file-source checkpointing (processed
  * files are remembered; a restart resumes at the first undelivered
  * commit). The complement of [[StreamingLakeSink]]: together they
  * chain lake tables into an end-to-end incremental pipeline
  * (bronze append stream → silver consumer), the streaming-native
  * form of the reference's daily watermark hop.
  *
  * Append-only contract: overwrite/compact/DML commits write NEW dirs
  * whose files the stream would re-deliver as fresh rows (a file
  * source cannot distinguish rewrite from append). Consume tables fed
  * by appends; rewritten tables need a fresh checkpoint, same as
  * re-reading any compacted upstream.
  *
  * Uncommitted-delivery window: files are staged under `data/<uuid>/`
  * BEFORE the manifest commit publishes them, and the glob discovers
  * them as soon as they exist. Against a live writer this is benign —
  * the commit follows the staging write within the same call, and the
  * sink's own commit claim serializes appends. The edge is a writer
  * that DIES (or permanently loses the commit race) between staging
  * and publish: its orphan dir's rows may already be delivered
  * downstream even though they never became part of the table, and
  * `removeOrphanFiles` will later delete the files (already-delivered
  * rows are unaffected; an unprocessed orphan would simply vanish).
  * Consumers needing committed-only delivery should read snapshots
  * batchwise (`LakeTable.read` per version) instead; a manifest-driven
  * streaming source (offsets = snapshot versions, the Delta/Iceberg
  * shape) is the upgrade path if that window ever matters in practice.
  */
object StreamingLakeSource {

  /** Stream of appended rows. The schema is pinned from the latest
    * snapshot (file sources require one); `recursiveFileLookup` lists
    * straight through any `_p_…=` partition level WITHOUT partition
    * inference — inference over per-commit hive dirs would bolt an
    * inferred partition column onto the pinned schema and fail the
    * reader's partition-arity check. Hidden transform values live only
    * in dir names and are not part of the user schema, so nothing is
    * lost; IDENTITY-partitioned tables (column stored in dir names,
    * absent from the files) are rejected rather than silently
    * null-filled.
    */
  def appendsStream(table: LakeTable): DataFrame = {
    val snap = table.latest.getOrElse(
      throw new IllegalStateException(s"empty lake table at ${table.rootLocation}"))
    val identity = snap.partitionBy.map(graft.lake.PartitionField.parse).filterNot(_.hidden)
    require(identity.isEmpty,
      s"appendsStream cannot deliver identity partition columns ${identity.map(_.name)} " +
        s"(values live in dir names, not files); use transform specs or batch reads")
    // the file source resolves columns BY NAME against the pinned
    // current schema; dirs from an older schema generation (metadata-
    // only rename/widen) would silently null-fill the renamed column
    // instead of going through the field-id alignment batch reads use
    require(snap.dirs.indices.forall(i => snap.dirSchemaJson(i) == snap.schemaJson),
      s"appendsStream requires a single schema generation at ${table.rootLocation}: " +
        "the table has dirs written under a pre-evolution schema; compact() it first " +
        "(rewrites every file to the current schema) or consume snapshots batchwise")
    table.spark.readStream
      .schema(snap.schema)
      .option("recursiveFileLookup", "true")
      .parquet(table.location("data") + "/*")
  }

  /** Committed-only variant: the manifest-driven [[GraftLakeSource]]
    * (offsets = snapshot versions). Staged-but-uncommitted dirs are
    * never delivered, and each micro-batch is exactly one span of
    * committed appends — prefer this over [[appendsStream]] unless
    * the file-source's per-file checkpointing is specifically wanted.
    */
  def committedStream(table: LakeTable,
                      maxCommitsPerTrigger: Option[Int] = None,
                      skipRewriteCommits: Boolean = false,
                      maxBytesPerTrigger: Option[Long] = None,
                      startingVersion: Option[String] = None): DataFrame = {
    val reader = table.spark.readStream
      .format(classOf[GraftLakeSourceProvider].getName)
      .option("path", table.rootLocation)
      .option("skipRewriteCommits", skipRewriteCommits.toString)
    maxCommitsPerTrigger.foreach(n => reader.option("maxCommitsPerTrigger", n.toString))
    maxBytesPerTrigger.foreach(n => reader.option("maxBytesPerTrigger", n.toString))
    // a version number, or 'latest' — the RECOVERY path after an
    // erasure/retention expiry removed the manifests a checkpointed
    // offset needs: reseed a fresh stream past the rewritten history
    startingVersion.foreach(v => reader.option("startingVersion", v))
    reader.load()
  }

  /** Change-data-feed stream (Delta CDF streaming shape): each
    * micro-batch delivers the row-level changelog of a span of
    * commits — user columns plus `_change_type` ('insert'/'delete')
    * and `_commit_version`. The continuous face of
    * [[graft.lake.LakeTable.readChanges]]: downstream tables, indexes
    * and caches stay in sync with an upsert-maintained 100 TB table
    * by processing deltas, never rescanning it. Admission control
    * composes (`maxCommitsPerTrigger` bounds each batch's commit
    * span).
    */
  def changesStream(table: LakeTable,
                    maxCommitsPerTrigger: Option[Int] = None,
                    skipRewriteCommits: Boolean = false,
                    startingVersion: Option[String] = None): DataFrame = {
    val reader = table.spark.readStream
      .format(classOf[GraftLakeSourceProvider].getName)
      .option("path", table.rootLocation)
      .option("changeFeed", "true")
      .option("skipRewriteCommits", skipRewriteCommits.toString)
    maxCommitsPerTrigger.foreach(n => reader.option("maxCommitsPerTrigger", n.toString))
    // a version number, or 'latest' to deliver only commits made after
    // stream start (Delta CDF's startingVersion) — REQUIRED on tables
    // whose early history was expired, where a from-0 CDC stream can
    // never start
    startingVersion.foreach(v => reader.option("startingVersion", v))
    reader.load()
  }
}
