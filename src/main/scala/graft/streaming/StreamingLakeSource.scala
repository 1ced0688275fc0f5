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
  */
object StreamingLakeSource {

  /** Stream of appended rows. The schema is pinned from the latest
    * snapshot (file sources require one); hidden partition columns are
    * not derived here — appends under transform specs store them in
    * dir names the glob skips past, and the stream delivers the user
    * schema.
    */
  def appendsStream(table: LakeTable): DataFrame = {
    val snap = table.latest.getOrElse(
      throw new IllegalStateException(s"empty lake table at ${table.root}"))
    table.spark.readStream
      .schema(snap.schema)
      .parquet(table.root.resolve("data").toString + "/*")
  }
}
