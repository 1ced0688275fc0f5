package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.connector.read.streaming.{ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow, Offset => ConnectorOffset}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType
import graft.lake.LakeTable

/** Manifest-driven streaming source over a lake table: offsets are
  * SNAPSHOT VERSIONS, and a micro-batch delivers exactly the data
  * dirs that entered the table through APPEND commits in
  * `(startVersion, endVersion]` — the Delta/Iceberg streaming-source
  * shape.
  *
  * This closes the raw-glob [[StreamingLakeSource]] delivery window:
  * a dir staged by a writer that later dies (or loses its commit
  * race) is NEVER delivered here, because discovery reads committed
  * manifests, not the filesystem. Offsets come from the engine's
  * checkpoint, and `getBatch` re-derives the same dirs from the same
  * immutable manifests on replay — deterministic redelivery, which is
  * what makes the file/foreachBatch sinks downstream exactly-once.
  *
  * Scale controls (options):
  *  - `maxCommitsPerTrigger`: admission control. A consumer restarting
  *    after long lag gets its backlog as BOUNDED micro-batches of at
  *    most this many commit versions each, instead of one batch
  *    spanning the whole outage (at 100 TB, a week of lag must not
  *    become a single multi-TB batch). Offsets are versions, so the
  *    engine's offset log splits the range deterministically.
  *  - `maxBytesPerTrigger`: byte-based admission control — commit
  *    sizes vary wildly (a trickle append vs a bulk backfill), so a
  *    count cap alone can still admit a multi-TB batch. Sizes come
  *    from the manifest's per-dir `graft.bytes:` keys (recorded at
  *    commit time; no filesystem listing on the hot path). Soft cap:
  *    the commit that crosses it is included, so one oversized commit
  *    can never starve progress. Composes with the count cap —
  *    whichever bound hits first ends the batch.
  *  - `skipRewriteCommits`: rewrite tolerance (Delta's
  *    `skipChangeCommits` shape). Data-rewriting commits —
  *    overwrite/compact/DML — are SKIPPED, keyed off the manifest `op`
  *    field, so background compaction (which this repo itself
  *    recommends) no longer kills every live consumer. Rows changed by
  *    skipped commits are not re-delivered; the stream remains a feed
  *    of appended rows only. Metadata-only commits (create, schema
  *    evolution) are always skipped — they move no data.
  *
  * Contracts (checked, loud failures over silent drift):
  *  - without `skipRewriteCommits`, a data-rewriting commit fails the
  *    batch that covers it, naming the version and op — silently
  *    re-delivering rewritten dirs as fresh rows would duplicate data.
  *  - snapshot retention must cover consumer lag: every manifest in
  *    the covered range must still exist (versions are walked
  *    one-by-one to classify ops) — getBatch fails naming the missing
  *    version otherwise.
  *  - schema is pinned at stream start; a delivered dir written under
  *    a different schema generation fails the batch (restart pins the
  *    new schema), rather than null-filling renamed columns.
  *
  * Usage:
  * {{{
  *   spark.readStream.format(classOf[GraftLakeSourceProvider].getName)
  *     .option("path", table.root.toString)
  *     .option("maxCommitsPerTrigger", "16")
  *     .option("skipRewriteCommits", "true")
  *     .load()
  *   // or StreamingLakeSource.committedStream(table, ...)
  * }}}
  */
class GraftLakeSourceProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graft-lake"

  private def tableFor(ctx: SQLContext, params: Map[String, String]): LakeTable = {
    val path = params.getOrElse("path",
      throw new IllegalArgumentException("graft-lake source needs option(\"path\", <table root>)"))
    new LakeTable(ctx.sparkSession, path)
  }

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
                            providerName: String, params: Map[String, String]): (String, StructType) = {
    val table = tableFor(ctx, params)
    val snap = table.latest.getOrElse(
      throw new IllegalStateException(s"empty lake table at ${table.rootLocation}"))
    val base = schema.getOrElse(snap.schema)
    val changeFeed = params.get("changefeed").orElse(params.get("changeFeed"))
      .exists(_.toBoolean)
    (shortName(), if (changeFeed) GraftLakeSource.changeSchema(base) else base)
  }

  override def createSource(ctx: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            params: Map[String, String]): Source = {
    val maxCommits = params.get("maxcommitspertrigger").orElse(params.get("maxCommitsPerTrigger"))
      .map(_.toInt)
    maxCommits.foreach(n => require(n >= 1, s"maxCommitsPerTrigger must be >= 1, got $n"))
    val maxBytes = params.get("maxbytespertrigger").orElse(params.get("maxBytesPerTrigger"))
      .map(_.toLong)
    maxBytes.foreach(n => require(n >= 1, s"maxBytesPerTrigger must be >= 1, got $n"))
    val skipRewrites = params.get("skiprewritecommits").orElse(params.get("skipRewriteCommits"))
      .exists(_.toBoolean)
    val changeFeed = params.get("changefeed").orElse(params.get("changeFeed"))
      .exists(_.toBoolean)
    val table = tableFor(ctx, params)
    // Delta CDF's startingVersion shape: seed a FRESH stream at a
    // chosen version ('latest' = only commits after stream start)
    // instead of version 0 — on a table whose early history was
    // expired (normal retention at scale) a from-0 stream can never
    // start, and a consumer that only wants new changes should not
    // have to replay the initial load.
    val startingVersion = params.get("startingversion").orElse(params.get("startingVersion"))
      .map {
        case v if v.equalsIgnoreCase("latest") =>
          table.latest.map(_.version).getOrElse(0L) + 1
        case v => v.toLong
      }
    startingVersion.foreach(v => require(v >= 1, s"startingVersion must be >= 1, got $v"))
    new GraftLakeSource(ctx, table, schema, maxCommits, skipRewrites,
      maxBytes, changeFeed, startingVersion)
  }
}

object GraftLakeSource {
  /** Schema of a change-feed stream: the user schema plus the CDC
    * columns [[graft.lake.LakeTable.readChanges]] emits.
    */
  def changeSchema(user: StructType): StructType =
    StructType(user.fields.toSeq :+
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType, nullable = false) :+
      org.apache.spark.sql.types.StructField("_commit_version",
        org.apache.spark.sql.types.LongType, nullable = false))
}

class GraftLakeSource(ctx: SQLContext, table: LakeTable,
                      userSchema: Option[StructType],
                      maxCommitsPerTrigger: Option[Int] = None,
                      skipRewriteCommits: Boolean = false,
                      maxBytesPerTrigger: Option[Long] = None,
                      changeFeed: Boolean = false,
                      startingVersion: Option[Long] = None) extends Source
    with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  /** Fresh-stream floor: the first batch starts AT `startingVersion`
    * (exclusive lower offset = the version before it). Checkpointed
    * restarts replay explicit offsets and never consult this.
    */
  private val seedOffset: Long = startingVersion.map(_ - 1).getOrElse(0L)

  private val pinned: StructType = {
    val fromTable = table.latest.getOrElse(
      throw new IllegalStateException(s"empty lake table at ${table.rootLocation}")).schema
    userSchema match {
      // the engine hands sourceSchema's result back through `schema`;
      // in change-feed mode that already carries the CDC columns —
      // pin the USER part (the table's own schema generation)
      case Some(s) if changeFeed => StructType(s.fields.toSeq.filterNot(f =>
        f.name == "_change_type" || f.name == "_commit_version"))
      case Some(s) => s
      case None    => fromTable
    }
  }
  private val pinnedJson = pinned.json

  {
    val identity = table.latest.toSeq.flatMap(_.partitionBy)
      .map(graft.lake.PartitionField.parse).filterNot(_.hidden)
    require(identity.isEmpty,
      s"graft-lake source cannot deliver identity partition columns ${identity.map(_.name)} " +
        "(values live in dir names, not files); use transform specs")
  }

  override def schema: StructType =
    if (changeFeed) GraftLakeSource.changeSchema(pinned) else pinned

  /** Highest version this source has served (or been initialized to by
    * the engine's recovery getBatch) — the base for admission control.
    * The engine re-initializes it on restart by replaying the last
    * logged batch, so capped offsets never regress below committed
    * progress; if they ever did, getBatch's empty-range guard delivers
    * an empty batch rather than duplicate rows.
    */
  @volatile private var highWater: Long = seedOffset

  /** Trigger.AvailableNow end state: the table version observed when
    * the run started. Without [[SupportsTriggerAvailableNow]] the
    * engine wraps a capped source in its generic wrapper, which
    * freezes the FIRST capped `getOffset` as the run's end — a
    * `maxCommitsPerTrigger` stream would then stop one batch in,
    * silently dropping every later commit. Implementing the trait
    * keeps the admission cap (many small batches) while the run ends
    * exactly at this target.
    */
  @volatile private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(table.latest.map(_.version).getOrElse(0L))

  // the caps are option-driven (this source's own admission control),
  // not engine-driven — mirror the Delta source's shape
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Admission-control face of [[getOffset]]: the engine passes its
    * committed end offset on every trigger (authoritative after a
    * checkpoint restart), which replaces the V1 path's getBatch-side
    * high-water recovery.
    */
  override def latestOffset(start: ConnectorOffset, limit: ReadLimit): ConnectorOffset = {
    Option(start).foreach { o =>
      highWater = math.max(highWater, versionOf(o))
    }
    getOffset.orNull
  }

  override def getOffset: Option[V1Offset] = {
    val tableLatest = table.latest.map(_.version).getOrElse(0L)
    // never admit past the AvailableNow target: commits racing in
    // after the run started belong to the next run
    val latest = availableNowTarget.fold(tableLatest)(math.min(tableLatest, _))
    val target =
      if (maxCommitsPerTrigger.isEmpty && maxBytesPerTrigger.isEmpty) latest
      else admit(latest)
    val off = math.max(highWater, target) // never move backwards
    if (off <= 0) None else Some(LongOffset(off))
  }

  /** Admission control: walk versions past the high-water mark,
    * admitting until the commit-count or byte cap is reached. Byte
    * sizes come from the manifest (`graft.bytes:` per-dir keys written
    * at commit time) — no filesystem listing here. The cap is SOFT:
    * at least one version is always admitted, and the version that
    * crosses the byte cap is included (Delta's `maxBytesPerTrigger`
    * shape — progress is never starved by one oversized commit).
    * A dir with no recorded size (pre-upgrade manifests) counts as
    * cap-filling, degrading to one-commit batches rather than
    * unbounded ones.
    */
  private def admit(latest: Long): Long = {
    val commitCap = maxCommitsPerTrigger.map(_.toLong).getOrElse(Long.MaxValue)
    val byteCap = maxBytesPerTrigger.getOrElse(Long.MaxValue)
    def satAdd(a: Long, b: Long): Long = { val s = a + b; if (s < a) Long.MaxValue else s }
    var prevDirs: Option[Set[String]] =
      if (highWater <= 0) Some(Set.empty) else table.snapshotAt(highWater).map(_.dirs.toSet)
    var v = highWater
    var commits = 0L
    var bytes = 0L
    while (v < latest && commits < commitCap && bytes < byteCap) {
      v += 1
      table.snapshotAt(v) match {
        case None =>
          // manifest expired mid-walk: stop capping and let getBatch
          // fail loud with its retention message
          return latest
        case Some(s) =>
          commits += 1
          val newDirs = prevDirs match {
            case Some(pd) => s.dirs.filterNot(pd.contains)
            case None     => s.dirs
          }
          // every op's NEW dirs count toward the byte cap (append,
          // upsert, MOR DML — in change-feed mode all of them deliver
          // rows; in append mode the extra conservatism only tightens
          // batches, never loosens them)
          newDirs.foreach { d =>
            bytes = satAdd(bytes,
              s.meta.get(graft.lake.FileStats.bytesKey(d)).map(_.toLong).getOrElse(byteCap))
          }
          prevDirs = Some(s.dirs.toSet)
      }
    }
    v
  }

  // offsets arrive as LongOffset live and as SerializedOffset(json)
  // after checkpoint recovery; LongOffset.json is the plain number.
  // (Takes the connector supertype so latestOffset shares the decoder —
  // the V1 Offset class extends it.)
  private def versionOf(o: ConnectorOffset): Long = o match {
    case l: LongOffset => l.offset
    case other         => other.json.trim.toLong
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val lo = start.map(versionOf).getOrElse(seedOffset)
    val hi = versionOf(end)
    highWater = math.max(highWater, math.max(lo, hi))
    if (changeFeed) return changeBatch(lo, hi)
    // the shared incremental walk (LakeTable.appendedDirs) classifies
    // each covered commit by its op: appends deliver their new dirs,
    // metadata commits pass, rewrites skip or fail. O(maxCommitsPerTrigger)
    // manifest reads per batch.
    val batch = try table.appendedDirs(lo, hi, skipRewriteCommits) catch {
      case e: graft.lake.RewriteCommitException => throw new IllegalStateException(
        s"commit v${e.version} of ${table.rootLocation} is a data-rewriting '${e.op}'; this " +
          "stream delivers appends only. Set option(\"skipRewriteCommits\", \"true\") to pass " +
          "over rewrite commits (their row changes are not delivered), or restart with a " +
          "fresh checkpoint to re-read the rewritten table.", e)
    }
    batch.foreach { case (d, sj, hiveCols) =>
      if (sj != pinnedJson) throw new IllegalStateException(
        s"dir $d of ${table.rootLocation} was written under a different schema generation than " +
          "this stream pinned at start; restart the stream to pick up the evolved schema")
      // a hive-imported dir's layout columns live in dir names; this
      // source reads files under a pinned schema and would deliver
      // nulls there — refuse instead of streaming wrong rows
      if (hiveCols.nonEmpty) throw new IllegalStateException(
        s"dir $d of ${table.rootLocation} is a hive-layout import (columns " +
          s"${hiveCols.mkString(", ")} live in directory names); the commit stream cannot " +
          "deliver it — read it with readIncremental/read instead")
    }
    val spark = ctx.sparkSession
    val rdd =
      if (batch.isEmpty) spark.sparkContext
        .emptyRDD[org.apache.spark.sql.catalyst.InternalRow]
      else {
        val paths = batch.map { case (d, _, _) => table.location(d) }
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

  /** Change-feed micro-batch: the row-level changelog of
    * `(lo, hi]` ([[LakeTable.readChanges]]) wrapped as a streaming
    * batch — Delta's CDF streaming read. Replays are deterministic
    * (changes derive from immutable manifests and delete files), which
    * keeps downstream exactly-once sinks exactly-once. The plan runs
    * distributed; only its RDD is handed to the engine.
    */
  private def changeBatch(lo: Long, hi: Long): DataFrame = {
    val spark = ctx.sparkSession
    val out = GraftLakeSource.changeSchema(pinned)
    // schema must not have moved: readChanges aligns generations to
    // the range end, which would silently rename this stream's pinned
    // columns mid-flight
    table.snapshotAt(hi).foreach { s =>
      if (s.schemaJson != pinnedJson) throw new IllegalStateException(
        s"lake table ${table.rootLocation} evolved its schema inside this stream's range; " +
          "restart the stream to pick up the new schema")
    }
    val rdd =
      if (lo >= hi) spark.sparkContext.emptyRDD[org.apache.spark.sql.catalyst.InternalRow]
      else {
        val df = try table.readChanges(lo, Some(hi), skipRewriteCommits) catch {
          case e: graft.lake.RewriteCommitException => throw new IllegalStateException(
            s"commit v${e.version} of ${table.rootLocation} is a data-rewriting '${e.op}' with " +
              "no row-level changelog. Set option(\"skipRewriteCommits\", \"true\") to pass over " +
              "it (its changes are not delivered), or restart from a fresh checkpoint.", e)
        }
        df.select(out.fieldNames.toSeq.map(org.apache.spark.sql.functions.col): _*)
          .queryExecution.toRdd
      }
    org.apache.spark.sql.GraftColumnBridge.streamingDataFrame(spark, rdd, out)
  }

  override def stop(): Unit = ()
}
