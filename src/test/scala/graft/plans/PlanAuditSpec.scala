package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.queries.{AnalyticsQueries, RelationalQueries, SimQueries}

/** Codifies SCALE.md's physical-plan claims: the shapes that make the
  * 100 TB story true must hold in the actual executed plans, not just
  * in prose. Plans are collected AFTER an action so AQE has finalized
  * (pre-execution `executedPlan.toString` hides the adaptive result —
  * round-1 pitfall).
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** `collect()` — NOT a noop write: a write executes a SEPARATE
    * QueryExecution, leaving this df's adaptive plan unfinalized
    * (isFinalPlan=false), which would silently audit the initial plan.
    */
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true") || !p.contains("AdaptiveSparkPlan"),
      "plan not finalized — audit would check the pre-execution plan")
    // the finalized string prints BOTH sections; audit the final one
    // only (counting over the whole string double-counts every node)
    val cut = p.indexOf("== Initial Plan ==")
    if (cut >= 0) p.substring(0, cut) else p
  }

  test("incremental scan pushes the watermark filter into the parquet scan (any ts layout)") {
    // Tables.eventsAfter compares in the RAW stored domain (long nanos
    // on TIMESTAMP(NANOS) fixtures, NTZ on timestamp[us] fixtures) so
    // the predicate reaches the scan as a plain stored-column comparison
    // in EITHER layout — the shape below is unit-agnostic on purpose
    val p = finalPlan(RelationalQueries.incrementalScan(spark, dir))
    assert(p.contains("PushedFilters: [IsNotNull(ts), GreaterThan(ts,"), p)
  }

  test("q5 dimension joins broadcast — the fact table never shuffles for dims") {
    val p = finalPlan(RelationalQueries.nationRevenue(spark, dir))
    assert(p.sliding("BroadcastHashJoin".length).count(_ == "BroadcastHashJoin") >= 2, p)
  }

  test("q1 scan prunes to the referenced columns only") {
    val p = finalPlan(RelationalQueries.pricingSummary(spark, dir))
    assert(p.contains("ReadSchema"), p)
    assert(!p.contains("l_comment") && !p.contains("l_shipmode"), p)
  }

  test("per-group top-k ranks with WindowGroupLimit below the exchange") {
    val p = finalPlan(SimQueries.cosineTopK(spark, dir))
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("Partial"), p)
  }

  test("global top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = finalPlan(RelationalQueries.topkLatest(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("text-scan kernels run inside whole-stage codegen in the scan stage") {
    val df = graft.queries.TextQueries.qualityScore(spark, dir)
    val p = finalPlan(df)
    // the kernels appear in the scan-stage Project directly over the
    // FileScan, and the old array-materializing formulations are gone.
    // (AQE plan strings omit the `*(n)` codegen markers — round-1
    // pitfall — so codegen itself is asserted by the kernels' own
    // doGenCode-driven specs, not by string-matching here.)
    assert(p.contains("token_count"), p)
    assert(!p.contains("regexp_extract_all"), p)
    assert(p.contains("FileScan parquet"), p)
  }

  test("pivot with explicit values plans pivotfirst aggregates (no value-discovery job)") {
    // explicit values plan straight to the two pivot aggregate phases
    // ((user_id, event_type) pre-agg → (user_id) pivotfirst); without
    // them Spark first runs an eager distinct-values collect job
    val p = finalPlan(AnalyticsQueries.pivotEvents(spark, dir))
    assert(p.contains("pivotfirst"), p)
    assert(p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") <= 2, p)
  }

  test("upsert-table scan applies deletes as BROADCAST anti-joins; filters still push to parquet") {
    import graft.lake.{LakeCatalog, LakePredicate, LakeDml, DmlStrategy, WriteMode}
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val cat = new LakeCatalog(spark,
      java.nio.file.Files.createTempDirectory("plan-upsert-").toString)
    cat.write(spark.range(0, 5000).select($"id", ($"id" % 97).cast("double").as("v")),
      "ns.t", WriteMode.Overwrite)
    val t = cat.table("ns.t")
    t.upsert(spark.range(10, 20).select($"id", lit(-1.0).as("v")), Seq("id"))
    LakeDml.delete(t, $"id" === 4999L, strategy = DmlStrategy.MergeOnRead)
    val df = t.scan(Seq(LakePredicate.LtEq("id", 100L)))
    val p = finalPlan(df)
    // both delete kinds (positional coordinates, equality keys) probe
    // as broadcast hash anti-joins — the corpus side never shuffles
    // for merge-on-read
    assert(p.sliding("BroadcastHashJoin".length).count(_ == "BroadcastHashJoin") >= 2, p)
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // the user predicate still reaches the parquet scan on the fact side
    assert(p.contains("PushedFilters: [IsNotNull(id), LessThanOrEqual(id,100)")
      || p.contains("LessThanOrEqual(id,100)"), p)
  }

  test("fuzzy match shuffles on the blocking key — no forced broadcast of the unbounded side") {
    // with auto-broadcast disabled a broadcast() HINT would still plan
    // a BroadcastExchange, so this run distinguishes "AQE chose
    // broadcast because the side is small" (fine at sf0.001, gone at
    // 100 TB) from "the query forces it" (the ER scale-killer)
    val abt = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val aabt = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", abt)
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val p = finalPlan(SimQueries.fuzzyMatch(spark, dir))
      assert(!p.contains("BroadcastExchange"), p)
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
      // the probe side's explicit repartition(blk) distributes the
      // in-block distance evals even when the input is one file
      assert(p.contains("Exchange hashpartitioning(blk"), p)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", abt)
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", aabt)
    }
  }

  test("seq packing reuses the window's partitioning for the aggregate — one exchange") {
    // window over (source, doc_id) then groupBy(source): the aggregate
    // must ride the window's hashpartitioning(source), not re-shuffle
    val p = finalPlan(graft.queries.TextQueries.seqPack(spark, dir))
    assert(p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") <= 1, p)
  }

  test("chunking is scan-stage: no exchange before the output sort") {
    // tokenize + sequence/explode + slice are all per-row; the ONLY
    // exchange in the plan must be the final presentation sort's range
    // partitioning — chunking a 100 TB corpus shuffles nothing
    val p = finalPlan(graft.queries.TextQueries.chunkOverlap(spark, dir))
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("assoc-lift is one-pass: a single events scan, pairs in-row, broadcast assembly") {
    // marker + singles + C(k,2) pairs all ride ONE explode over the
    // per-user collect_set, one type-keyed aggregate counts the three
    // row classes, and every branch (user total / single / pair
    // supports) filters that tiny frame — so Catalyst reuses one
    // exchange chain and the fact table is READ ONCE; rule assembly
    // never shuffle-joins
    val p = finalPlan(AnalyticsQueries.assocLift(spark, dir))
    assert(p.sliding("FileScan".length).count(_ == "FileScan") == 1, p)
    assert(p.contains("collect_set"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
  }

  test("bigram LM: equi-joins on gram keys, nested-loop only for the 1-row vocab") {
    // no FORCED broadcast of the count sides: AQE picks the strategy
    // from runtime sizes (broadcast at this SF, shuffle joins once
    // vocab² outgrows the threshold at corpus scale) — the invariant
    // is that every corpus-sized join is an equi-join, with the single
    // permitted nested-loop being the 1-row vocabulary cross-join
    val p = finalPlan(graft.queries.TextQueries.bigramLogProb(spark, dir))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.sliding("BroadcastNestedLoopJoin".length)
      .count(_ == "BroadcastNestedLoopJoin") <= 1, p)
  }

  test("tf-idf keywords rank with WindowGroupLimit — k rows per group pre-exchange") {
    val p = finalPlan(graft.queries.TextQueries.idfKeywords(spark, dir))
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("federation joins broadcast both dimension sides across formats") {
    // graft lake ⋈ Delta ⋈ Iceberg ⋈ JDBC: nation and region (tiny)
    // must broadcast; only the fact-side equi-join may shuffle
    val p = finalPlan(graft.queries.LakeQueries.federation(spark, dir))
    assert(p.sliding("BroadcastHashJoin".length)
      .count(_ == "BroadcastHashJoin") >= 2, p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("salted skew join broadcasts the replicated dim; lineitem never shuffles for it") {
    // the whole point of salting: the (small × buckets) side ships to
    // the fact's partitions — a shuffle of lineitem for the join would
    // recreate the hot-key partition the salt exists to break up
    val p = finalPlan(RelationalQueries.skewSaltedJoin(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    // aggregation is partial (map-side combine) before its exchange
    assert(p.contains("partial_count") || p.contains("Partial"), p)
  }

  test("heavy hitters: candidate set broadcasts; the corpus never shuffles pre-join") {
    val p = finalPlan(graft.queries.TextQueries.heavyHitters(spark, dir))
    // pass 2's semi-join ships the (bounded) candidates, not the corpus
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("runtime-filtered join pushes the dim key set into the fact scan") {
    val p = finalPlan(graft.queries.LakeQueries.runtimeFilterJoin(spark, dir))
    // the flat In reaches the lake scan as a data filter (the
    // file/directory pruning itself is asserted in RuntimeFilterSpec
    // via numFiles metrics)
    assert(p.contains(" IN (") || p.contains("isin") || p.contains("In("), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("sessionize: lag + running sum + session aggregate ride ONE user exchange and sort") {
    // the running sum consumes the lag's output, so Spark plans two
    // Window nodes — but both share (user_id | ts, event_id), so the
    // second adds NO sort, and the (user_id, sid) aggregate rides the
    // window's hashpartitioning(user_id) — one shuffle, one sort
    // (plus the presentation orderBy's range exchange + sort)
    val p = finalPlan(AnalyticsQueries.sessionizeBatch(spark, dir))
    assert(p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") <= 1, p)
    assert(p.sliding("Sort [".length).count(_ == "Sort [") == 2, p)
  }

  test("interpolate: grid join broadcasts; both direction passes share the type exchange") {
    // the dense grid left-joins obs via BroadcastHashJoin (grid rows
    // are |types|×288, never data-sized), and the prev/next window
    // passes both partition by event_type — at most the aggregate's
    // and the window's two hash exchanges, nothing per-direction
    val p = finalPlan(AnalyticsQueries.interpolate(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") <= 2, p)
  }

  test("regr trend: per-group min broadcasts onto ONE map-side-combined moment pass") {
    // two tiny aggregates (min, moments), each map-side partial; the
    // min result broadcasts back so the events scan never shuffles
    // for the join — at most the two aggregates' hash exchanges
    val p = finalPlan(AnalyticsQueries.regrTrend(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("partial_min") || p.contains("partial_count"), p)
    assert(p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") <= 2, p)
  }

  test("autocorr: the moment aggregate rides the lag window's type exchange") {
    // window partitions by event_type; the subsequent groupBy reuses
    // that partitioning — one hash exchange total
    val p = finalPlan(AnalyticsQueries.autocorr(spark, dir))
    assert(p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") <= 1, p)
  }

  test("bitmap segments aggregate partially map-side; overlap joins one broadcast row") {
    // TypedImperativeAggregate → ObjectHashAggregate with a partial
    // pass (one bitmap per group per partition on the wire); the
    // 1-row purchase segment broadcasts for the overlap
    val p = finalPlan(AnalyticsQueries.bitmapDistinct(spark, dir))
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.contains("partial_bitmap64_agg"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("containment join is inverted-index shaped: an equi-join on the shingle hash, never all-pairs") {
    // at sf0.001 AQE broadcasts the tiny index side; at scale the same
    // plan shuffles on sh_h — either way it's a hash EQUI-join keyed by
    // the shingle hash, never a cartesian/nested-loop pair explosion
    val p = finalPlan(SimQueries.ngramContainment(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Join [sh_h") || p.contains("hashpartitioning(sh_h") ||
      p.contains("[sh_h"), p)
  }
}
