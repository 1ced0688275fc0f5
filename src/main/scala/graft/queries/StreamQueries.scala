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

  /** Run two independent fixture tasks on concurrent action threads
    * (one Spark session schedules both fine; commits touch disjoint
    * table roots), settling BOTH before rethrowing — a failure in one
    * must not leave the other committing unsupervised past the
    * caller's exception.
    */
  private[queries] def inParallel(a: => Unit, b: => Unit): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val fa = Future(a)
    val fb = Future(b)
    val ra = scala.util.Try(Await.result(fa, Duration.Inf))
    val rb = scala.util.Try(Await.result(fb, Duration.Inf))
    // when BOTH fail, the second failure must not vanish — attach it
    // to the first as a suppressed exception before rethrowing
    (ra, rb) match {
      case (scala.util.Failure(ea), scala.util.Failure(eb)) if ea ne eb =>
        ea.addSuppressed(eb)
      case _ => ()
    }
    ra.get
    rb.get
  }

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

  /** Custom arbitrary state end to end: per-user running counts via
    * `mapGroupsWithState` in Update mode, AvailableNow to completion —
    * each micro-batch emits the user's running total, so the MAX per
    * user over the update stream is the final state, which must equal
    * the batch `count(*)` the oracle states. State is one long per
    * user (bounded by distinct users, the contract that keeps
    * arbitrary-state streaming viable at 100 TB); the update-stream
    * fold is a user-keyed aggregate over rows ∝ users × batches.
    */
  def customState(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    EventsWindows.statefulUserCounts(spark, s"$dir/events.parquet")
      .groupBy($"user_id")
      .agg(max($"n_events").as("n_events"))
      .orderBy($"user_id")
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

  /** Stream-stream LEFT OUTER interval join, AvailableNow to
    * completion: unmatched purchases emit null click columns only on
    * state eviction, so both sides restrict to
    * `ts <= max(ts) − 20 min` while the watermark (10 min delay) is
    * assigned on the unfiltered stream — every outer result flushes
    * deterministically and the emitted set equals the batch left
    * outer join the DuckDB oracle states.
    */
  def streamStreamOuterJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    EventsWindows.streamStreamLeftOuterJoin(spark, s"$dir/events.parquet")
      .orderBy($"user_id", $"purchase_id", $"click_id")
  }

  /** Incremental MinHash dedup at ingest: the documents corpus arrives
    * as four interleaved micro-batches (id % 4 slices, so later
    * batches hold ids SMALLER than indexed ones — the retroactive-
    * tombstone path runs, not just the happy order) and each batch
    * LSH-joins against the signature index of everything already
    * ingested. Order-independent drop rule (near-dup with any
    * smaller-id doc) ⇒ the final kept set equals the batch exhaustive
    * answer the DuckDB oracle states.
    */
  def incrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.ops.IncrementalDedup.dedupAtIngest(
      spark, Tables(spark, dir).documents,
      LakeQueries.scratchDir("graft-incdedup-"))
  }

  /** Incremental SEMANTIC dedup at ingest: the embeddings corpus plus
    * one exact copy of every vector (vec_id + 10000001 — the +1 offset
    * shifts copies into DIFFERENT arrival slices than their originals,
    * so for ids ≡ 3 (mod 4) the COPY is indexed before the original
    * arrives and the retroactive tombstone must fire). Each micro-batch
    * SRP-LSH-joins against the bucket index of everything already
    * ingested and exact-verifies cosine ≥ 0.99. Identical vectors
    * collide in every LSH table (the bucket is a pure function of the
    * vector), so recall on the planted pairs is 1 and the DuckDB
    * oracle states the kept set in closed form: originals kept, copies
    * dropped.
    */
  def incrementalSemDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables(spark, dir).embeddings
    val off = 10000001L
    val corpus = emb.select($"vec_id", $"embedding")
      .unionByName(emb.select(($"vec_id" + off).as("vec_id"), $"embedding"))
    graft.ops.IncrementalSemDedup.dedupAtIngest(
      spark, corpus, LakeQueries.scratchDir("graft-incsemdedup-"))
  }

  /** At-ingest benchmark-contamination screening: the eval slice
    * (doc_id % 50 = 0) indexes once as distinct raw 4-grams; the rest
    * of the corpus arrives as interleaved micro-batches and each batch
    * joins ONLY the bucket-pruned index slice its own gram hashes
    * land in. Flags are exact distinct-shared-gram counts on raw gram
    * strings (no digest in the checked path), so the DuckDB oracle
    * restates the screen in closed form.
    */
  def incrementalContamination(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables(spark, dir).documents
    graft.ops.IncrementalContamination.screenAtIngest(
      spark,
      docs.filter($"doc_id" % 50 === 0),
      docs.filter($"doc_id" % 50 =!= 0),
      LakeQueries.scratchDir("graft-inccontam-"))
  }

  /** Lake table consumed through the manifest-driven streaming source
    * ([[graft.streaming.GraftLakeSource]]): events land in a lake
    * table as two append commits, the committed stream drains them by
    * snapshot-version offsets (AvailableNow), and the per-type counts
    * must equal the batch aggregation the DuckDB oracle states —
    * proving committed-exactly delivery end to end.
    */
  def lakeCommitStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.lake.{LakeCatalog, WriteMode}
    val cat = new LakeCatalog(spark, LakeQueries.scratchDir("graft-lake-").toString)
    val events = Tables(spark, dir).events
    cat.write(events.filter($"event_id" % 2 === 0), "bronze.ev", WriteMode.Overwrite)
    cat.write(events.filter($"event_id" % 2 =!= 0), "bronze.ev", WriteMode.Append)
    // a rewrite commit mid-history: with skipRewriteCommits the
    // consumer passes over it instead of dying or double-delivering
    cat.table("bronze.ev").compact(targetPartitions = 4)
    val out = LakeQueries.scratchDir("graft-lakestream-out-")
    val q = graft.streaming.StreamingLakeSource.committedStream(cat.table("bronze.ev"),
      skipRewriteCommits = true)
      .writeStream.format("parquet")
      .option("path", out.resolve("data").toString)
      .option("checkpointLocation", out.resolve("ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.read.parquet(out.resolve("data").toString)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), countDistinct($"event_id").as("n_distinct"))
      .orderBy($"event_type")
  }

  /** Stream-side dimension enrichment with per-batch runtime
    * filtering: events drain from a lake table's committed stream, and
    * each micro-batch enriches against a bucket-partitioned customer
    * dim through [[graft.lake.RuntimeFilter.prunedJoin]] — the batch's
    * key set (driver-bounded: [[graft.lake.DriverTiers]]'
    * driver-exact cap) rides into the dim scan as a flat `In` the
    * bucket transform projects to file pruning. The roles invert from
    * the batch star join: here the LAKE side is the dimension being
    * pruned and the STREAM batch is the selective probe. At 100 TB
    * this is the lookup-join shape — the dim may be huge, but each
    * trigger reads only the files its batch's keys can live in,
    * instead of stream-static-joining the whole dim every trigger.
    * Result equals the plain batch join the oracle declares.
    */
  def streamEnrich(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.lake.{LakeCatalog, WriteMode}
    import graft.ProfStream.prof
    val cat = new LakeCatalog(spark, LakeQueries.scratchDir("graft-enrich-").toString)
    val t = Tables(spark, dir)
    val ev = t.events.select($"event_id", $"user_id", $"value")
    prof("enrich fixtures (parallel)") {
      inParallel(
        cat.write(t.customer.select($"c_custkey", $"c_mktsegment"), "dim.customer",
          WriteMode.Overwrite, partitionBy = Seq("bucket(8, c_custkey)")),
        {
          cat.write(ev.filter($"event_id" % 3 === 0), "bronze.ev", WriteMode.Overwrite)
          cat.table("bronze.ev").write(ev.filter($"event_id" % 3 === 1), WriteMode.Append)
          cat.table("bronze.ev").write(ev.filter($"event_id" % 3 === 2), WriteMode.Append)
        })
    }
    val dimT = cat.table("dim.customer")
    val out = LakeQueries.scratchDir("graft-enrich-out-")
    // unpaced AvailableNow: all pending commits drain in ONE trigger —
    // the enrichment itself is per-batch regardless of pacing, and the
    // commit-paced admission-control path (`maxCommitsPerTrigger`) is
    // pinned separately by StreamingLakeSinkSpec; paying three
    // micro-batch lifecycles here bought no extra proof
    val q = graft.streaming.StreamingLakeSource
      .committedStream(cat.table("bronze.ev"))
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // batchId-keyed overwrite, not a blind append: foreachBatch is
        // at-least-once, and a retried batch must replace its own
        // partial output instead of duplicating rows
        prof(s"enrich trigger b$batchId") {
          // driver-exact cap ([[graft.lake.DriverTiers]]): a trigger's
          // key cardinality (~distinct users per batch) stays on the
          // cheap In/isin tier (one key collect + the join) instead of
          // tripping into the checkpoint+summary+bloom tier meant for
          // driver-large dims
          graft.lake.RuntimeFilter.prunedJoin(dimT, "c_custkey", batch, "user_id",
            cap = graft.lake.DriverTiers.Default.driverKeyCap)
            .select(col("event_id"), col("user_id"), col("value"),
              col("c_mktsegment"))
            .write.mode("overwrite")
            .parquet(out.resolve(s"data/b$batchId").toString)
        }
        ()
      }
      .option("checkpointLocation", out.resolve("ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    prof("enrich stream drain")(q.awaitTermination())
    spark.read.parquet(out.resolve("data").toString + "/b*")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n"), graft.SqlCompat.sumd($"value").as("total"))
      .orderBy($"c_mktsegment")
  }

  /** Delta transaction log consumed as a STREAM end-to-end
    * ([[graft.streaming.DeltaStreamingSource]], no Delta runtime):
    * events land in a Delta table as two partitioned append commits
    * plus an OPTIMIZE-shaped checkpoint, the version-offset stream
    * drains them into a parquet sink, and per-type counts must equal
    * the batch aggregation the DuckDB oracle states — partition
    * values re-injected from the log, never from the files.
    */
  def deltaStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.lake.DeltaExport
    val loc = LakeQueries.scratchDir("graft-deltasrc-").toString
    val exp = new DeltaExport(spark, loc)
    val events = Tables(spark, dir).events
      .select($"event_id", $"user_id", $"event_type", $"ts", $"value")
    exp.append(events.filter($"event_id" % 2 === 0), partitionBy = Seq("event_type"))
    exp.append(events.filter($"event_id" % 2 =!= 0))
    exp.checkpoint() // metadata-only; the stream passes over it
    val out = LakeQueries.scratchDir("graft-deltastream-out-")
    val q = spark.readStream
      .format(classOf[graft.streaming.DeltaStreamSourceProvider].getName)
      .option("path", loc)
      .load()
      .writeStream.format("parquet")
      .option("path", out.resolve("data").toString)
      .option("checkpointLocation", out.resolve("ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.read.parquet(out.resolve("data").toString)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), countDistinct($"event_id").as("n_distinct"))
      .orderBy($"event_type")
  }

  /** Change-data-feed STREAM consumed end-to-end: the same 4-version
    * history as `lake_cdc_read` (overwrite, append, MOR delete,
    * equality-delete upsert) drained through
    * [[graft.streaming.StreamingLakeSource.changesStream]] into a
    * parquet sink — proving the streaming face of the changelog
    * delivers exactly the batch face's rows (the oracle is the
    * closed-form changelog plus v1's base inserts). Downstream
    * summarized per change type for a compact deterministic result.
    */
  def lakeCdcStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.lake.{DmlStrategy, LakeCatalog, LakeDml, WriteMode}
    val cat = new LakeCatalog(spark, LakeQueries.scratchDir("graft-cdc-").toString)
    val customer = Tables(spark, dir).customer
    cat.write(customer.repartition(4), "silver.customer", WriteMode.Overwrite)   // v1
    val t = cat.table("silver.customer")
    t.write(customer.filter($"c_nationkey" === 5).select(                         // v2
      (-$"c_custkey").as("c_custkey"), $"c_name", $"c_nationkey",
      lit(0.0).as("c_acctbal"), lit("APPEND").as("c_mktsegment")),
      WriteMode.Append)
    LakeDml.delete(t, $"c_nationkey" >= 20, strategy = DmlStrategy.MergeOnRead)   // v3
    t.upsert(customer.filter($"c_nationkey" < 3)                                  // v4
      .withColumn("c_acctbal", $"c_acctbal" + 500.0)
      .withColumn("c_mktsegment", lit("UPSERT")), Seq("c_custkey"))
    val out = LakeQueries.scratchDir("graft-cdcstream-out-")
    val q = graft.streaming.StreamingLakeSource.changesStream(t)
      .writeStream.format("parquet")
      .option("path", out.resolve("data").toString)
      .option("checkpointLocation", out.resolve("ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.read.parquet(out.resolve("data").toString)
      .groupBy($"_commit_version", $"_change_type")
      .agg(count(lit(1)).as("n_rows"),
        graft.SqlCompat.sumd($"c_acctbal").as("sum_bal"))
      .orderBy($"_commit_version", $"_change_type")
  }

  /** Continuously-maintained materialized view
    * ([[graft.streaming.ViewMaintenance]]): per-user event aggregates
    * stay fresh as the events lake table commits — first AvailableNow
    * pass builds the view, a second pass folds an append + MOR delete
    * incrementally (asserted via refreshMode meta), and the result
    * must equal the direct aggregate of the source's final state.
    * SUMs ride exact integer milli-values so the incremental fold is
    * bit-equal to the oracle; MIN/MAX ride the same near-continuous
    * column, so the delete window exercises BOTH sides of the
    * extremum-touch split in one refresh — groups whose deleted
    * values sat strictly inside their bounds fold, groups whose
    * bound was deleted recompute (the [[graft.lake.IncrementalView]]
    * fast path, audited via RecomputedGroupsKey meta).
    */
  def viewMaintain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.lake.{DmlStrategy, IncrementalView, LakeCatalog, LakeDml, WriteMode}
    import graft.ProfStream.prof
    val cat = new LakeCatalog(spark, LakeQueries.scratchDir("graft-vm-").toString)
    val events = Tables(spark, dir).events.select(
      $"event_id", $"user_id", $"event_type",
      round($"value" * 1000).cast("long").as("millis"))
    prof("vm fixture write") {
      // realistic file sizing: 4 parts of ~17k rows, not 32 shards of
      // 2k — every downstream changelog read, recompute scan, and
      // merge walks the file list, and tiny-file overhead would
      // dominate what the query actually measures
      cat.write(events.filter($"event_id" % 3 =!= 0).repartition(4),
        "bronze.ev", WriteMode.Overwrite)
    }
    val ckpt = LakeQueries.scratchDir("graft-vm-ckpt-").toString
    def pass(label: String): Unit = prof(s"vm pass $label") {
      val q = graft.streaming.ViewMaintenance.maintain(cat, "bronze.ev",
        "gold.by_user", Seq("user_id"),
        Seq("count(*) AS cnt", "sum(millis) AS sum_millis",
          "min(millis) AS min_millis", "max(millis) AS max_millis"), ckpt)
      q.awaitTermination()
    }
    pass("1-full")
    require(cat.table("gold.by_user").latest.get
      .meta(IncrementalView.RefreshModeKey) == "full", "first pass builds full")
    prof("vm append+delete") {
      cat.write(events.filter($"event_id" % 3 === 0).repartition(2),
        "bronze.ev", WriteMode.Append)
      LakeDml.delete(cat.table("bronze.ev"), $"event_id" % 5 === 0,
        strategy = DmlStrategy.MergeOnRead)
    }
    pass("2-incr")
    require(cat.table("gold.by_user").latest.get
      .meta(IncrementalView.RefreshModeKey) == "incremental",
      "maintenance must fold the changelog, not rebuild")
    IncrementalView.read(cat, "gold.by_user").orderBy($"user_id")
  }

  /** Streaming maintenance of an incremental JOIN view: two commit
    * tick-streams (fact + dim) drive the same CAS-guarded
    * [[graft.lake.JoinView]] refresh, so the enrichment view follows
    * whichever side commits — a dim upsert re-enriches its fan-out,
    * a fact append lands enriched, and a replayed tick is a no-op.
    * First pass builds full, the second must fold changelogs
    * (asserted in-query); the oracle states the final enrichment.
    */
  def joinViewStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.lake.{LakeCatalog, IncrementalView, WriteMode}
    import graft.ProfStream.prof
    val cat = new LakeCatalog(spark, LakeQueries.scratchDir("graft-jvs-").toString)
    val t = Tables(spark, dir)
    prof("jvs fixture writes (parallel)") {
      inParallel(
        cat.write(t.customer.where($"c_custkey" % 3 =!= 0)
          .select($"c_custkey", $"c_nationkey", $"c_acctbal"),
          "silver.cust", WriteMode.Overwrite),
        cat.write(t.nation.select($"n_nationkey", $"n_name"),
          "silver.nat", WriteMode.Overwrite))
    }
    val ckF = LakeQueries.scratchDir("graft-jvs-ckf-").toString
    val ckD = LakeQueries.scratchDir("graft-jvs-ckd-").toString
    def pass(label: String): Unit = prof(s"jvs pass $label") {
      val (qf, qd) = graft.streaming.ViewMaintenance.maintainJoin(cat,
        "silver.cust", "silver.nat", "gold.cust_enriched",
        factKey = "c_custkey", joinKey = "c_nationkey", dimKey = "n_nationkey",
        dimCols = Seq("n_name"), ckF, ckD, maxCommitsPerTrigger = Some(1))
      qf.awaitTermination(); qd.awaitTermination()
    }
    pass("1-full")
    def mode() = cat.table("gold.cust_enriched").latest.get
      .meta(IncrementalView.RefreshModeKey)
    require(mode() == "full", s"first pass builds full, got ${mode()}")
    // both sides move: fact append + dim upsert fan-out
    prof("jvs append+upsert (parallel)") {
      inParallel(
        cat.table("silver.cust").write(t.customer.where($"c_custkey" % 3 === 0)
          .select($"c_custkey", $"c_nationkey", $"c_acctbal"), WriteMode.Append),
        cat.table("silver.nat").upsert(t.nation.where($"n_nationkey" < 10)
          .select($"n_nationkey", lit("NX").as("n_name")), Seq("n_nationkey")))
    }
    pass("2-incr")
    require(mode() == "incremental",
      s"maintenance must fold the changelogs, got ${mode()}")
    graft.lake.JoinView.read(cat, "gold.cust_enriched").orderBy($"c_custkey")
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

  /** ORC roundtrip — the second columnar format Spark ships natively
    * (vectorized reader, predicate pushdown, footer stats — the same
    * scan economics as parquet). Events aggregate is written as ORC,
    * read back with a pushed-down type filter, and must equal the
    * parquet-side answer the oracle states: format interop without a
    * single row drifting.
    */
  def orcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tmp = LakeQueries.scratchDir("graft-orc-").toString + "/events"
    Tables(spark, dir).events
      .select($"event_id", $"event_type", $"value")
      .write.mode("overwrite").orc(tmp)
    spark.read.orc(tmp)
      .where($"event_type" =!= "error") // pushed into the ORC scan
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), graft.SqlCompat.sumd($"value").as("sum_value"))
      .orderBy($"event_type")
  }

  /** Custom TypedImperativeAggregate inside streaming state: per
    * tumbling hour × type, the 3 highest-valued events via `topk_by`
    * (heap state serialized between micro-batches).
    */
  def streamTopk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    EventsWindows.topkStreaming(spark, s"$dir/events.parquet")
      .orderBy($"ws", $"event_type", $"rank")
  }

  /** Streaming maintenance of exact distinct-user segments
    * ([[graft.ops.BitmapSegments]]): events land in a lake table over
    * three commits, the committed-commit stream folds each commit's
    * per-(type, day) bitmaps into the segment store (OR-merge +
    * equality-delete upsert, batch-marker exactly-once), with a
    * RESTART between the second and third commit proving the
    * checkpoint resumes past already-folded history. The result —
    * DAU per (type, day) — is read from segment cardinalities alone;
    * the oracle recomputes it relationally from raw events.
    */
  def segmentMaintain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.lake.{LakeCatalog, LakeTable, WriteMode}
    import graft.ProfStream.prof
    val cat = new LakeCatalog(spark, LakeQueries.scratchDir("graft-seg-").toString)
    val events = Tables(spark, dir).events
      .select($"event_id", $"ts", $"user_id", $"event_type")
    prof("seg fixture writes x2") {
      cat.write(events.filter($"event_id" % 3 === 0), "bronze.ev", WriteMode.Overwrite)
      cat.table("bronze.ev").write(events.filter($"event_id" % 3 === 1), WriteMode.Append)
    }
    val segT = new LakeTable(spark,
      LakeQueries.scratchDir("graft-seg-store-").resolve("segments").toString)
    val ckpt = LakeQueries.scratchDir("graft-seg-ckpt-").toString
    prof("seg maintain 1") {
      // unpaced: both pending commits fold in ONE trigger (the bitmap
      // OR-merge is associative, so batching commits per trigger is
      // pure admission control); the restart-resume proof below still
      // holds — the second maintain must fold ONLY the third commit
      graft.ops.BitmapSegments.maintain(spark, cat.table("bronze.ev"), segT, ckpt,
        maxCommitsPerTrigger = None)
    }
    // late-arriving third commit; the restarted stream folds ONLY it
    prof("seg third commit") {
      cat.table("bronze.ev").write(events.filter($"event_id" % 3 === 2), WriteMode.Append)
    }
    prof("seg maintain 2") {
      graft.ops.BitmapSegments.maintain(spark, cat.table("bronze.ev"), segT, ckpt)
    }
    graft.ops.BitmapSegments.dailyCounts(segT)
  }
}
