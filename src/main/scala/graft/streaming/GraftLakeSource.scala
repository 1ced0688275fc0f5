package graft.streaming

import java.nio.file.Paths
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType
import graft.lake.LakeTable

/** Manifest-driven streaming source over a lake table: offsets are
  * SNAPSHOT VERSIONS, and a micro-batch delivers exactly the data
  * dirs that entered the table in `(startVersion, endVersion]` — the
  * Delta/Iceberg streaming-source shape.
  *
  * This closes the raw-glob [[StreamingLakeSource]] delivery window:
  * a dir staged by a writer that later dies (or loses its commit
  * race) is NEVER delivered here, because discovery reads committed
  * manifests, not the filesystem. Offsets come from the engine's
  * checkpoint, and `getBatch` re-derives the same dirs from the same
  * immutable manifests on replay — deterministic redelivery, which is
  * what makes the file/foreachBatch sinks downstream exactly-once.
  *
  * Contracts (checked, loud failures over silent drift):
  *  - append-only tables: an overwrite/compact/DML commit introduces
  *    REWRITTEN dirs that would re-deliver as fresh rows; same as any
  *    compacted upstream, restart with a fresh checkpoint.
  *  - snapshot retention must cover consumer lag: `expireSnapshots`
  *    may delete a manifest an offline consumer still needs — getBatch
  *    then fails naming the missing version.
  *  - schema is pinned at stream start; a mid-stream schema evolution
  *    commit fails the batch that first covers it (restart pins the
  *    new schema), rather than null-filling renamed columns.
  *
  * Usage:
  * {{{
  *   spark.readStream.format(classOf[GraftLakeSourceProvider].getName)
  *     .option("path", table.root.toString).load()
  *   // or StreamingLakeSource.committedStream(table)
  * }}}
  */
class GraftLakeSourceProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graft-lake"

  private def tableFor(ctx: SQLContext, params: Map[String, String]): LakeTable = {
    val path = params.getOrElse("path",
      throw new IllegalArgumentException("graft-lake source needs option(\"path\", <table root>)"))
    new LakeTable(ctx.sparkSession, Paths.get(path))
  }

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
                            providerName: String, params: Map[String, String]): (String, StructType) = {
    val table = tableFor(ctx, params)
    val snap = table.latest.getOrElse(
      throw new IllegalStateException(s"empty lake table at ${table.root}"))
    (shortName(), schema.getOrElse(snap.schema))
  }

  override def createSource(ctx: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            params: Map[String, String]): Source =
    new GraftLakeSource(ctx, tableFor(ctx, params), schema)
}

class GraftLakeSource(ctx: SQLContext, table: LakeTable,
                      userSchema: Option[StructType]) extends Source {

  private val pinned: StructType = userSchema.getOrElse(
    table.latest.getOrElse(
      throw new IllegalStateException(s"empty lake table at ${table.root}")).schema)
  private val pinnedJson = pinned.json

  {
    val identity = table.latest.toSeq.flatMap(_.partitionBy)
      .map(graft.lake.PartitionField.parse).filterNot(_.hidden)
    require(identity.isEmpty,
      s"graft-lake source cannot deliver identity partition columns ${identity.map(_.name)} " +
        "(values live in dir names, not files); use transform specs")
  }

  override def schema: StructType = pinned

  override def getOffset: Option[V1Offset] =
    table.latest.map(s => LongOffset(s.version))

  // offsets arrive as LongOffset live and as SerializedOffset(json)
  // after checkpoint recovery; LongOffset.json is the plain number
  private def versionOf(o: V1Offset): Long = o match {
    case l: LongOffset => l.offset
    case other         => other.json.trim.toLong
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val lo = start.map(versionOf).getOrElse(0L)
    val hi = versionOf(end)
    def dirsOf(v: Long): Seq[(String, String)] = // (dir, write-time schema)
      if (v <= 0) Nil
      else {
        val s = table.snapshotAt(v).getOrElse(throw new IllegalStateException(
          s"snapshot v$v of ${table.root} is gone (expired?); the stream needs " +
            "retention >= consumer lag — restart with a fresh checkpoint"))
        s.dirs.indices.map(i => (s.dirs(i), s.dirSchemaJson(i))).toSeq
      }
    val before = dirsOf(lo).map(_._1).toSet
    val added = dirsOf(hi).filterNot { case (d, _) => before.contains(d) }
    added.foreach { case (d, sj) =>
      if (sj != pinnedJson) throw new IllegalStateException(
        s"dir $d of ${table.root} was written under a different schema generation than " +
          "this stream pinned at start; restart the stream to pick up the evolved schema")
    }
    val spark = ctx.sparkSession
    val rdd =
      if (added.isEmpty) spark.sparkContext
        .emptyRDD[org.apache.spark.sql.catalyst.InternalRow]
      else {
        val paths = added.map { case (d, _) => table.root.resolve(d).toString }
        // recursiveFileLookup: hive subdirs of transform specs are
        // listed through without partition inference (hidden values
        // are not part of the user schema)
        spark.read.schema(pinned)
          .option("recursiveFileLookup", "true")
          .parquet(paths: _*)
          .queryExecution.toRdd
      }
    // the streaming engine requires an isStreaming plan for batches
    org.apache.spark.sql.GraftColumnBridge.streamingDataFrame(spark, rdd, pinned)
  }

  override def stop(): Unit = ()
}
