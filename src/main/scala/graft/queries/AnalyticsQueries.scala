package graft.queries

import graft.{SqlCompat, Tables}
import graft.SqlCompat._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Breadth pack: the window / scalar / generator / pivot / as-of
  * surface a drop-in analytics engine needs beyond the reference's own
  * inventory (SURVEY.md §2.5-§2.8 list these as engine-shipped
  * built-ins).
  */
object AnalyticsQueries {

  /** Window-function breadth: ranking family + lag/lead + range frame
    * aggregates in one pass over lineitem per supplier.
    */
  def windowFunctions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"l_suppkey").orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
    Tables(spark, dir).lineitem
      // explicit early projection: the window shuffle+sort then carries
      // 5 columns instead of the full 16-column lineitem row
      .select($"l_suppkey", $"l_shipdate", $"l_orderkey", $"l_linenumber", $"l_quantity")
      .withColumn("rn", row_number().over(w))
      .withColumn("rk", rank().over(w))
      .withColumn("drk", dense_rank().over(w))
      .withColumn("tile", ntile(4).over(w))
      .withColumn("prev_qty", lag($"l_quantity", 1).over(w))
      .withColumn("next_qty", lead($"l_quantity", 1).over(w))
      .withColumn("rolling_qty",
        sum(dec($"l_quantity")).over(w.rowsBetween(-2, 0)).cast("double"))
      .filter($"rn" <= 5)
      .select($"l_suppkey", $"rn", $"rk", $"drk", $"tile",
        $"l_orderkey", $"l_linenumber", $"prev_qty", $"next_qty", $"rolling_qty")
      .orderBy($"l_suppkey", $"rn")
  }

  /** Scalar-function breadth: math, string (incl. levenshtein), date
    * arithmetic, conditional — computed per part row.
    */
  def scalarFunctions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).part
      .select(
        $"p_partkey",
        round(sqrt(dec($"p_retailprice").cast("double")), 6).as("sqrt_price"),
        abs($"p_size" - 25).as("size_dev"),
        pow(lit(2), $"p_size" % 10).cast("long").as("pow2"),
        lpad(upper($"p_brand"), 12, "#").as("brand_pad"),
        translate($"p_type", "aeiou", "AEIOU").as("type_tr"),
        levenshtein($"p_brand", $"p_type").as("lev"),
        length($"p_name").as("name_len"),
        nullif($"p_size", lit(25)).as("size_nullif"),
        coalesce(nullif($"p_size", lit(25)), lit(-1)).as("size_coal"))
      .orderBy($"p_partkey")
  }

  /** Generator/explode surface: global word frequencies from documents
    * (posexplode keeps positions; frequency ranking is the classic
    * flatten-aggregate).
    */
  def wordFrequencies(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).documents
      .select(explode(graft.ops.TextOps.words($"text")).as("word"))
      .groupBy($"word")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"word")
  }

  /** Pivot: event counts per user across event types (wide layout).
    * Explicit value list keeps the plan a single aggregate (no
    * distinct-values pre-query) — required for a stable schema at scale.
    */
  def pivotEvents(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).events
      .groupBy($"user_id")
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy($"user_id")
  }

  /** Unpivot (melt): the wide-per-user event-count layout back to long
    * (user, event_type, n) rows — `Dataset.unpivot`, the inverse of
    * [[pivotEvents]] and the reshape every feature-store export needs.
    * Narrow (no shuffle: each wide row expands in place); the oracle
    * is the portable UNION ALL formulation.
    */
  def unpivotEvents(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wide = Tables(spark, dir).events
      .groupBy($"user_id")
      .pivot("event_type", Seq("click", "view", "purchase"))
      .agg(count(lit(1)))
      .na.fill(0L)
    wide.unpivot(
      ids = Array($"user_id"),
      values = Array($"click", $"view", $"purchase"),
      variableColumnName = "event_type",
      valueColumnName = "n")
      .orderBy($"user_id", $"event_type")
  }

  /** As-of join: each purchase event matched to the user's most recent
    * prior-or-equal signup/click state event. Implemented Spark-first
    * as union + partitioned last-value window (one shuffle on user_id,
    * no per-row range probe) — the scalable formulation of ASOF JOIN;
    * DuckDB's native ASOF JOIN is the oracle.
    */
  /** Binned range join (point-in-interval): for every error event,
    * count the same user's clicks in the following 10 minutes. The
    * inequality condition alone would plan as BroadcastNestedLoopJoin —
    * O(errors · clicks); [[graft.ops.RangeJoin]] turns it into an
    * equi-join on (user, time-bin) plus the exact filter, asserted
    * in-query: the executed plan contains no nested-loop or cartesian
    * node.
    */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val events = Tables(spark, dir).events
      .select($"event_id", $"ts", $"user_id", $"event_type")
    val errors = events.filter($"event_type" === "error")
      .select($"event_id", $"user_id", $"ts".as("lo"),
        ($"ts" + expr("INTERVAL 10 MINUTES")).as("hi"))
    val clicks = events.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id", $"ts")
    val joined = graft.ops.RangeJoin.pointInInterval(
      clicks, "ts", errors, "lo", "hi",
      keys = Seq("user_id"), binSeconds = 600)
    val counts = joined.groupBy($"event_id")
      .agg(count(lit(1)).as("n_clicks"))
    val out = errors.select($"event_id")
      .join(counts, Seq("event_id"), "left")
      .select($"event_id", coalesce($"n_clicks", lit(0L)).as("n_clicks"))
      .orderBy($"event_id")
    out.collect() // materialize so the executed plan is inspectable
    def noLoops(p: org.apache.spark.sql.execution.SparkPlan): Boolean = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        noLoops(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => noLoops(q.plan)
      case _: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => false
      case _: org.apache.spark.sql.execution.joins.CartesianProductExec => false
      case other => other.children.forall(noLoops)
    }
    require(noLoops(out.queryExecution.executedPlan),
      "range join must plan as an equi-join on (keys, bin), never a nested loop")
    out
  }

  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables(spark, dir).events
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts", $"value")
    val states = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts".as("state_ts"), $"event_id".as("state_event_id"))
    // union trick: tag sides, order by time, carry last state forward
    val tagged = purchases
      .withColumn("side", lit(1))
      .withColumn("state_ts", lit(null).cast("timestamp"))
      .withColumn("state_event_id", lit(null).cast("long"))
      .unionByName(states
        .withColumn("side", lit(0))
        .withColumn("event_id", $"state_event_id")
        .withColumn("ts", $"state_ts")
        .withColumn("value", lit(null).cast("double"))
        .select($"user_id", $"event_id", $"ts", $"value", $"side", $"state_ts", $"state_event_id"))
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"side", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("asof_ts", last($"state_ts", ignoreNulls = true).over(w))
      .withColumn("asof_event_id", last($"state_event_id", ignoreNulls = true).over(w))
      .filter($"side" === 1)
      .select($"user_id", $"event_id", $"ts", $"asof_ts", $"asof_event_id")
      .orderBy($"user_id", $"event_id")
  }

  /** Percentile surface: exact interpolated quantiles of order totals
    * per priority (Spark `percentile` ≡ DuckDB `quantile_cont`).
    */
  def percentiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // one array-form call: a second percentile() doubles the value-
    // buffer collection (measured 1.27s vs 0.45s at sf0.1)
    Tables(spark, dir).orders
      .groupBy($"o_orderpriority")
      .agg(
        expr("percentile(o_totalprice, array(0.5D, 0.9D))").as("ps"),
        count(lit(1)).as("n"))
      .select($"o_orderpriority",
        element_at($"ps", 1).as("p50"),
        element_at($"ps", 2).as("p90"), $"n")
      .orderBy($"o_orderpriority")
  }

  /** The SQL entry point: the same engine drives plain Spark SQL over
    * registered views (what a SQL-first user of the reference would
    * write). Catalyst plans this identically to the DataFrame API.
    */
  def sqlSurface(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders.createOrReplaceTempView("v_orders")
    t.customer.createOrReplaceTempView("v_customer")
    spark.sql(
      """SELECT c_mktsegment,
        |       COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM v_orders JOIN v_customer ON o_custkey = c_custkey
        |WHERE o_orderstatus <> 'X'
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin)
  }

  /** Full-outer + cross joins: nation coverage by customers vs
    * suppliers (full outer over per-side aggregates), and region ×
    * order-priority cross-join grid. Rounds out the join-type surface.
    */
  def outerCrossJoins(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    val c = t.customer.groupBy($"c_nationkey".as("nationkey"))
      .agg(count(lit(1)).as("n_cust"))
    val s = t.supplier.groupBy($"s_nationkey".as("nationkey"))
      .agg(count(lit(1)).as("n_supp"))
    val cov = c.join(s, Seq("nationkey"), "full_outer")
      .select($"nationkey", coalesce($"n_cust", lit(0L)).as("n_cust"),
        coalesce($"n_supp", lit(0L)).as("n_supp"))
    val gridSize = t.region
      .crossJoin(t.orders.select($"o_orderpriority").distinct())
      .agg(count(lit(1)).as("grid_size"))
    cov.crossJoin(broadcast(gridSize))
      .orderBy($"nationkey")
  }

  /** Date arithmetic: add/diff/truncate/last-day per order. */
  def dateArithmetic(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).orders
      .select(
        $"o_orderkey",
        date_add($"o_orderdate".cast("date"), 30).as("due_date"),
        datediff(lit(java.sql.Date.valueOf("2000-01-01")), $"o_orderdate".cast("date")).as("days_to_y2k"),
        // pin DATE on both sides: o_orderdate's physical flavor has
        // drifted across fixture generations (tz-micros → NTZ-micros),
        // and date_trunc's result type tracks its input in BOTH engines;
        // truncating through DATE gives the same type in every layout
        date_trunc("quarter", $"o_orderdate".cast("date")).cast("date").as("quarter_start"),
        last_day($"o_orderdate".cast("date")).as("month_end"))
      .orderBy($"o_orderkey")
  }

  /** Null semantics: null-safe equality, NULLIF-generated nulls, and
    * explicit null ordering.
    */
  def nullSemantics(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).part
      .select($"p_partkey", nullif($"p_size", lit(25)).as("sz"))
      .groupBy($"sz")
      .agg(count(lit(1)).as("n"), count($"sz").as("n_nonnull"))
      .orderBy($"sz".asc_nulls_first)
  }

  /** Correlated scalar subquery (Catalyst decorrelates it into an
    * aggregate + join): parts at their brand's minimum retail price.
    */
  def correlatedSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir).part.createOrReplaceTempView("v_part")
    spark.sql(
      """SELECT p_brand, p_partkey, p_retailprice
        |FROM v_part p
        |WHERE p_retailprice = (SELECT MIN(p2.p_retailprice)
        |                       FROM v_part p2 WHERE p2.p_brand = p.p_brand)
        |ORDER BY p_brand, p_partkey""".stripMargin)
  }

  /** CUBE: all grouping-set combinations over two dimensions. */
  def cubeSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).orders
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"), sumd($"o_totalprice").as("total"))
      .select(
        coalesce($"o_orderstatus", lit("ALL")).as("status"),
        coalesce($"o_orderpriority", lit("ALL")).as("priority"),
        $"n", $"total")
      .orderBy($"status", $"priority")
  }

  /** GROUPING SETS with grouping() markers — the explicit form between
    * rollup and cube (per-dimension marginals plus the grand total,
    * no cross products). Plans as ONE Expand + aggregate pass.
    */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir).orders.createOrReplaceTempView("orders_gs")
    spark.sql(
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS priority,
        |       count(*) AS n,
        |       grouping(o_orderstatus) AS g_status,
        |       grouping(o_orderpriority) AS g_priority
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority, g_status, g_priority""".stripMargin)
  }

  /** Hourly gap-filled resample over one day (time-series
    * densification): the (type × hour) grid left-joins the observed
    * hourly aggregates, so silent hours materialize as zeros — the
    * shape every downsampling dashboard and training-data time-bucket
    * join needs. The grid is a broadcast cross of two tiny sides;
    * the per-hour aggregate is one map-side-combined pass over the
    * day's pruned scan.
    */
  def gapFill(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lo = graft.SqlCompat.utcTimestamp("2024-01-02 00:00:00")
    val hi = graft.SqlCompat.utcTimestamp("2024-01-03 00:00:00")
    val ev = Tables(spark, dir).events
    val counts = ev.where($"ts" >= lo && $"ts" < hi)
      .groupBy($"event_type", date_trunc("hour", $"ts").as("hour"))
      .agg(count(lit(1)).as("n"), sumd($"value").as("sum_value"))
    val types = ev.select($"event_type").distinct()
    val hours = spark.range(0, 24).select(
      (lit(lo).cast("timestamp") + expr("make_interval(0,0,0,0,CAST(id AS INT),0,0)")).as("hour"))
    types.crossJoin(broadcast(hours))
      .join(counts, Seq("event_type", "hour"), "left")
      .select($"event_type", $"hour",
        coalesce($"n", lit(0L)).as("n"),
        coalesce($"sum_value", lit(0.0)).as("sum_value"))
      .orderBy($"event_type", $"hour")
  }

  /** Fixed-bin histogram — the single-pass distribution profile every
    * data-quality dashboard draws; bins compute in the scan
    * projection (explicit floor arithmetic, engine-portable), so the
    * only shuffle is the low-cardinality bin aggregate.
    */
  def histogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bin = when($"o_totalprice" < 0.0, lit(0L))
      .when($"o_totalprice" >= 400000.0, lit(21L))
      .otherwise(floor($"o_totalprice" / 20000.0).cast("long") + 1L)
    Tables(spark, dir).orders
      .select(bin.as("bin"), $"o_totalprice")
      .groupBy($"bin")
      .agg(count(lit(1)).as("n"),
        sumd($"o_totalprice").as("sum_price"))
      .orderBy($"bin")
  }

  /** Sketch aggregates for 100 TB interactive profiling:
    * approx_count_distinct (HLL++) next to the exact count so the
    * error is visible.
    *
    * One scan, no Expand, no join: dedup (l_returnflag, l_orderkey)
    * first, then count the deduped stream exactly AND feed it to the
    * HLL — a sketch is duplicate-insensitive, so its estimate is
    * identical to running over the raw rows. (Round-1 formulations
    * measured at sf0.1: fused countDistinct + HLL in one aggregate
    * 33s — sort-based fallback; two scans joined ~3s; this ~1s.)
    *
    * The sketch estimate itself is engine-specific, so the oracle
    * checks the exact count plus `approx_ok` — the estimate landing
    * within 5× the configured rsd (0.02; measured HLL++ error across
    * sf0.001–0.1 stays ≤ 3.3%).
    */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).lineitem
      .select($"l_returnflag", $"l_orderkey").distinct()
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("exact_orders"),
        approx_count_distinct($"l_orderkey", 0.02).as("approx_orders"))
      .select($"l_returnflag", $"exact_orders",
        (abs($"approx_orders" - $"exact_orders") <=
          $"exact_orders" * 0.10).as("approx_ok"))
      .orderBy($"l_returnflag")
  }

  /** Association rules over per-user event baskets — frequent-pair
    * support / confidence / lift, the market-basket aggregation behind
    * recommendation and cross-feature analysis ("users who error also
    * purchase?"). A pair (a < b) is supported by a user iff BOTH types
    * occur in their history; lift > 1 means co-occurrence beats
    * independence.
    *
    * Scale shape: ONE pass. A user-keyed aggregate collects each
    * user's distinct-type set (map-side partial dedup, so a power user
    * with 10^6 events ships at most |types| values); one explode then
    * emits, per user, a basket marker (null, null), a (t, null) row
    * per type, and the C(k, 2) sorted pairs (a, b) built IN-ROW by a
    * double-transform — fan-out bounded by the type domain, not event
    * volume, and no self-join. A single type-keyed aggregate counts
    * all three row classes at once; user totals, single supports, and
    * pair supports are then filters over that TINY frame, so Catalyst
    * reuses one exchange/scan for every branch and the rule assembly
    * is all broadcast. Rates are single divisions of exact longs.
    */
  def assocLift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nullS = lit(null).cast("string")
    val baskets = Tables(spark, dir).events
      .groupBy($"user_id").agg(array_sort(collect_set($"event_type")).as("types"))
    val agg = baskets
      .select(explode(concat(
        array(struct(nullS.as("a"), nullS.as("b"))),                 // basket marker
        transform($"types", x => struct(x.as("a"), nullS.as("b"))),  // singles
        flatten(transform($"types", (x, i) =>                        // a < b pairs
          transform(slice($"types", i + 2, size($"types")),
            y => struct(x.as("a"), y.as("b"))))))).as("p"))
      .groupBy($"p.a".as("a"), $"p.b".as("b"))
      .agg(count(lit(1)).as("c"))
    val n = agg.where($"a".isNull).select($"c".cast("double").as("n_users"))
    val singles = agg.where($"a".isNotNull && $"b".isNull)
      .select($"a".as("t"), $"c".as("sc"))
    agg.where($"b".isNotNull).select($"a", $"b", $"c".as("pc"))
      .join(broadcast(singles.select($"t".as("a"), $"sc".as("a_sc"))), Seq("a"))
      .join(broadcast(singles.select($"t".as("b"), $"sc".as("b_sc"))), Seq("b"))
      .crossJoin(broadcast(n))
      .select($"a", $"b", $"pc".as("n_both"),
        round($"pc" / $"n_users", 6).as("support"),
        round($"pc".cast("double") / $"a_sc", 6).as("confidence"),
        round(($"pc" * $"n_users") / ($"a_sc" * $"b_sc".cast("double")), 6).as("lift"))
      .orderBy($"a", $"b")
  }

  /** Ordered conversion funnel (view → click → purchase): a user
    * reaches step k iff steps 1..k occur at strictly increasing event
    * times — the sequential-pattern aggregation product analytics runs
    * on every event stream (and "order matters" is what a plain
    * per-type count cannot express).
    *
    * Scale shape: three user-keyed aggregates, each joined to the
    * previous step's (user, first-reach-time) frame — every join key
    * is the user id the aggregates already partitioned by, so the
    * chain reuses one hash partitioning; timestamps are compared,
    * never emitted (no flavor pin needed). Counts are exact; rates are
    * single divisions of exact longs.
    */
  def funnelSteps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables(spark, dir).events.select($"user_id", $"event_type", $"ts")
    val s1 = ev.where($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("t1"))
    val s2 = ev.where($"event_type" === "click")
      .join(s1, Seq("user_id")).where($"ts" > $"t1")
      .groupBy($"user_id").agg(min($"ts").as("t2"))
    val s3 = ev.where($"event_type" === "purchase")
      .join(s2, Seq("user_id")).where($"ts" > $"t2")
      .groupBy($"user_id").agg(min($"ts").as("t3"))
    val counts =
      s1.agg(count(lit(1)).as("users")).withColumn("step", lit("1_view"))
        .unionByName(s2.agg(count(lit(1)).as("users")).withColumn("step", lit("2_click")))
        .unionByName(s3.agg(count(lit(1)).as("users")).withColumn("step", lit("3_purchase")))
    val base = s1.agg(count(lit(1)).cast("double").as("base"))
    counts.crossJoin(broadcast(base))
      .select($"step", $"users",
        round($"users" / $"base", 6).as("conversion"))
      .orderBy($"step")
  }

  /** First-order event transition matrix — P(next event type | type)
    * from each user's time-ordered sequence: the Markov flow analysis
    * ("after viewing, 40% click") that complements [[funnelSteps]]'s
    * fixed path and [[assocLift]]'s unordered co-occurrence.
    *
    * Scale shape: one user-partitioned window (`lead` over (ts,
    * event_id) — the id tiebreak keeps sequences deterministic under
    * equal timestamps), then a type-pair aggregate whose output is
    * |types|²-bounded; row totals derive FROM that tiny frame, so the
    * normalization joins broadcast and the events scan runs once.
    * Timestamps are only compared, never emitted.
    */
  /** Distribution-drift detection (population stability index) — the
    * data-quality gate a production pipeline runs between corpus
    * slices before shipping a batch to training: per event_type, bin
    * `value` into 10 fixed-width buckets, Laplace-smooth both slices'
    * bin shares, and sum `(pA−pB)·ln(pA/pB)`. Cross-engine hash
    * determinism (SCALE.md "oracle determinism contract"): each term is
    * folded to `decimal(27,13)` BEFORE the sum — the decimal truncation
    * absorbs the 1-ulp libm-`ln` difference between JVM and DuckDB
    * builds, and the decimal sum is exact and order-free (a plain
    * `round(sum(double), 6)` failed the driver twice: the double sum
    * drifts by add order and can straddle the 0.5e-6 boundary). The
    * rounded decimal then converts to double identically on both
    * engines; `+ 0.0` normalizes a would-be negative zero.
    * Slices split on event_id parity — deterministic and portable.
    * Scale shape: one (type, bin, slice-conditional) hash aggregate
    * over the scan, then a types×10-bounded grid assembled with
    * broadcast joins — no second pass over the data, no skew exposure
    * (the aggregate key space is tiny and uniform).
    */
  def driftPsi(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nBins = 10
    val binned = Tables(spark, dir).events
      .select($"event_type",
        pmod($"event_id", lit(2)).as("slice"),
        least(greatest(floor($"value" / 10).cast("int"), lit(0)), lit(nBins - 1)).as("bin"))
    val counts = binned.groupBy($"event_type", $"bin")
      .agg(sum(when($"slice" === 0, 1L).otherwise(0L)).as("na"),
        sum(when($"slice" === 1, 1L).otherwise(0L)).as("nb"))
    val totals = counts.groupBy($"event_type")
      .agg(sum($"na").as("ta"), sum($"nb").as("tb"))
    // the full type×bin grid: silent bins still contribute their
    // smoothed mass (that is what makes PSI defined on sparse slices)
    val grid = totals.select($"event_type", $"ta", $"tb",
      explode(sequence(lit(0), lit(nBins - 1))).as("bin"))
    val pa = ($"na" + 1).cast("double") / ($"ta" + nBins).cast("double")
    val pb = ($"nb" + 1).cast("double") / ($"tb" + nBins).cast("double")
    grid.join(counts, Seq("event_type", "bin"), "left")
      .na.fill(0L, Seq("na", "nb"))
      .select($"event_type", $"ta", $"tb",
        ((pa - pb) * log(pa / pb)).as("c"))
      .groupBy($"event_type")
      .agg(max($"ta").as("n_a"), max($"tb").as("n_b"),
        (round(sum($"c".cast("decimal(27,13)")), 6).cast("double") + lit(0.0))
          .as("psi"))
      .orderBy($"event_type")
  }

  /** Time-RANGE window aggregates — the frame class row windows can't
    * express: per event, count and exact sum of `value` over the SAME
    * USER's trailing hour (frame bounds in event-time microseconds,
    * peers with equal timestamps included on both engines by RANGE
    * semantics). One shuffle on user_id + a per-partition time sort;
    * the frame is evaluated by a sliding accumulator, never a per-row
    * rescan — at 100 TB this is the cheapest possible shape for
    * "rate/velocity features per entity" (fraud velocity, session
    * heat, rate limits). The sum runs over DECIMAL so both engines
    * produce the identical double, order notwithstanding.
    */
  def timeRangeWindow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hourUs = 3600L * 1000000L
    val w = Window.partitionBy($"user_id").orderBy(unix_micros($"ts"))
      .rangeBetween(-hourUs, 0)
    Tables(spark, dir).events
      .select($"event_id", $"user_id", $"ts", $"value")
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("sum_1h", sum(SqlCompat.dec($"value")).over(w).cast("double"))
      .select($"event_id", $"user_id", $"n_1h", $"sum_1h")
      .orderBy($"event_id")
  }

  def eventTransitions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val steps = Tables(spark, dir).events
      .select($"user_id", $"event_id", $"ts", $"event_type")
      .withColumn("next_type", lead($"event_type", 1).over(w))
      .where($"next_type".isNotNull)
    val trans = steps
      .groupBy($"event_type".as("from_type"), $"next_type".as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = trans.groupBy($"from_type").agg(sum($"n").as("tot"))
    trans.join(broadcast(totals), Seq("from_type"))
      .select($"from_type", $"to_type", $"n",
        round($"n" / $"tot".cast("double"), 6).as("p"))
      .orderBy($"from_type", $"to_type")
  }

  /** Cohort retention: users grouped by first-seen day, counted per
    * (cohort day, day offset) of later activity — the staple
    * activation/retention matrix next to [[funnelSteps]]'s conversion
    * view. Timestamps flow only through `date()` (flavor-insensitive);
    * the matrix is two user-keyed aggregates and one join on the same
    * key, so one partitioning carries the whole plan.
    */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables(spark, dir).events
      .select($"user_id", to_date($"ts").as("d"))
    val firstSeen = ev.groupBy($"user_id").agg(min($"d").as("cohort_d"))
    val active = ev.distinct()
    active.join(firstSeen, Seq("user_id"))
      .groupBy($"cohort_d", datediff($"d", $"cohort_d").as("day_offset"))
      .agg(count(lit(1)).as("users"))
      .orderBy($"cohort_d", $"day_offset")
  }

  /** Quantile-sketch aggregation (`percentile_approx`, Spark's
    * KLL/GK-family sketch): mergeable partial sketches are THE way to
    * take percentiles at 100 TB — exact percentiles need a global sort
    * or all values in one aggregation buffer. Like
    * [[approxDistinct]], the sketch internals are engine-specific, so
    * the emitted columns are the exact count plus `ok` booleans
    * asserting the sketch's actual guarantee — a RANK bound, not a
    * value bound (a value tolerance is meaningless in a sparse tail):
    * each estimate must land inside the exact ±1%-quantile band, vs
    * the sketch's configured rank error of 10⁻⁴.
    */
  def approxPercentiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pcts = array(lit(0.5), lit(0.95), lit(0.99))
    Tables(spark, dir).events
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n"),
        percentile_approx($"value", pcts, lit(10000)).as("approx"),
        expr("percentile(value, array(0.49D, 0.51D, 0.94D, 0.96D, 0.98D, 1.0D))").as("band"))
      .select($"event_type", $"n",
        ($"approx"(0).between($"band"(0), $"band"(1))).as("p50_ok"),
        ($"approx"(1).between($"band"(2), $"band"(3))).as("p95_ok"),
        ($"approx"(2).between($"band"(4), $"band"(5))).as("p99_ok"))
      .orderBy($"event_type")
  }

  /** Statistical QC / drift detection: per-type z-score outliers
    * (|z| > 3) over event values — the data-quality monitor a
    * continuously-fed pipeline runs on every batch.
    *
    * Cross-engine determinism: mean and variance derive from EXACT
    * decimal Σx and Σx² (the [[SqlCompat]] rule — double summation
    * order would differ between engines), then both engines evaluate
    * the identical double expression tree on identical inputs.
    * Scale shape: one tiny grouped aggregate (|event types| rows)
    * broadcast back onto the scan — the outlier filter runs in the
    * scan stage; no second shuffle, no window over the full stream.
    */
  def zscoreOutliers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables(spark, dir).events
    val stats = ev.groupBy($"event_type").agg(
        count(lit(1)).cast("double").as("n"),
        sum(dec($"value")).cast("double").as("s"),
        sum(dec($"value") * dec($"value")).cast("double").as("s2"))
      .select($"event_type", $"n",
        ($"s" / $"n").as("mean"),
        sqrt(($"s2" - $"s" * $"s" / $"n") / ($"n" - 1.0)).as("std"))
      // degenerate groups (n == 1 → NaN std; zero variance → std 0)
      // cannot have outliers, and the NaN comparison semantics of
      // |z| > 3 diverge between engines (DuckDB sorts NaN above all
      // values) — filter them out before they reach the predicate
      .where($"n" > 1.0 && $"std" > 0.0)
    ev.join(broadcast(stats), Seq("event_type"))
      .withColumn("z", ($"value" - $"mean") / $"std")
      .where(abs($"z") > 3.0)
      .select($"event_type", $"event_id", $"value", round($"z", 6).as("z"))
      .orderBy($"event_type", $"event_id")
  }

  /** Linear interpolation over a gapped time series — the densify step
    * after [[gapFill]]: silent buckets get the straight line between
    * the nearest observed neighbors instead of a zero (sensor feeds,
    * rate series, feature backfill before model training).
    *
    * Shape: per (type, 5-min bucket) aggregate over one pruned day,
    * left-joined onto the dense (type × 288) grid, then ONE window
    * pass per direction carrying the last/next observed (value, index)
    * via `last/first(..., ignoreNulls)`. Edge buckets (no neighbor on
    * one side) hold the single available neighbor — no extrapolation.
    *
    * Cross-engine determinism: observed values are exact-decimal sums
    * ([[SqlCompat.sumd]]); the interpolation expression is the same
    * scalar double tree on both engines (weights are ratios of small
    * bucket-index ints, so evaluation is order-free).
    *
    * Scale: the window partitions by series key — at 100 TB the keys
    * are high-cardinality (per-sensor, per-feature), so the sort is
    * many small per-key runs, not one giant ordered shuffle; the
    * dense grid is |keys| × |buckets| rows built from a broadcast
    * cross, never a data-sized join.
    */
  def interpolate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lo = graft.SqlCompat.utcTimestamp("2024-01-02 00:00:00")
    val hi = graft.SqlCompat.utcTimestamp("2024-01-03 00:00:00")
    val ev = Tables(spark, dir).events
    // observed 5-minute buckets: idx = minutes-since-midnight / 5
    val obs = ev.where($"ts" >= lo && $"ts" < hi)
      .select($"event_type",
        (floor((unix_timestamp($"ts") - unix_timestamp(lit(lo))) / 300L))
          .cast("int").as("idx"),
        $"value")
      .groupBy($"event_type", $"idx")
      .agg(sumd($"value").as("v"))
    val types = ev.select($"event_type").distinct()
    val grid = types.crossJoin(broadcast(
      spark.range(0, 288).select($"id".cast("int").as("idx"))))
    val wPrev = Window.partitionBy($"event_type").orderBy($"idx")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy($"event_type").orderBy($"idx")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    grid.join(obs, Seq("event_type", "idx"), "left")
      .withColumn("pv", last($"v", ignoreNulls = true).over(wPrev))
      .withColumn("pi", last(when($"v".isNotNull, $"idx"), ignoreNulls = true).over(wPrev))
      .withColumn("nv", first($"v", ignoreNulls = true).over(wNext))
      .withColumn("ni", first(when($"v".isNotNull, $"idx"), ignoreNulls = true).over(wNext))
      .select($"event_type",
        (lit(lo).cast("timestamp") +
          expr("make_interval(0,0,0,0,0,0, idx * 300)")).as("bucket"),
        when($"v".isNotNull, $"v")
          .when($"pv".isNotNull && $"nv".isNotNull,
            $"pv" + ($"nv" - $"pv") *
              (($"idx" - $"pi").cast("double") / ($"ni" - $"pi").cast("double")))
          .otherwise(coalesce($"pv", $"nv")).as("filled"),
        when($"v".isNotNull, lit("obs"))
          .when($"pv".isNotNull && $"nv".isNotNull, lit("interp"))
          .otherwise(lit("edge")).as("src"))
      .orderBy($"event_type", $"bucket")
  }

  /** Batch gap-based sessionization — the classic lag + conditional
    * cumulative-sum shape: a session breaks when a user is silent for
    * more than 30 minutes; each session reports its span, event count
    * and spend. The streaming twin is `s_sessionize` (state-store
    * session windows); this is the backfill/replay form every
    * analytics warehouse also needs.
    *
    * Both window passes share ONE (user_id, ts, event_id) sort and
    * exchange: the running sum consumes the lag's output so Spark
    * plans two Window nodes, but the second inherits the first's
    * ordering and adds no sort, and the (user_id, sid) aggregate is
    * co-partitioned by the window's hashpartitioning(user_id)
    * (plan-asserted in `PlanAuditSpec`).
    * Scale: per-user runs; user_id cardinality is the parallelism and
    * no state beyond the sort spills (no whole-series collect).
    * Tiebreak on event_id makes equal-timestamp ordering (and thus
    * session numbering) engine-deterministic.
    */
  def sessionizeBatch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables(spark, dir).events
      .select($"user_id", $"ts", $"event_id", $"value")
      .withColumn("prev_ts", lag($"ts", 1).over(w))
      .withColumn("new_s",
        when($"prev_ts".isNull ||
          unix_timestamp($"ts") - unix_timestamp($"prev_ts") > 1800L, 1L)
          .otherwise(0L))
      .withColumn("sid",
        sum($"new_s").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"sid")
      .agg(min($"ts").as("session_start"), max($"ts").as("session_end"),
        count(lit(1)).as("n_events"), sumd($"value").as("sum_value"))
      .orderBy($"user_id", $"sid")
  }

  /** EWMA anomaly detection over hourly event counts — the streaming-
    * adjacent QC monitor ("is this hour's volume wildly off its recent
    * trend?") run as a batch window pass.
    *
    * The trailing-6-hour EWMA uses halving weights 32/16/8/4/2/1
    * (α=1/2) over the STRICTLY preceding hours, so the flagged hour
    * never smooths itself; the first 6 hours of the month have no full
    * history and are excluded. Weights are powers of two and counts
    * are small ints, so the weighted sum is exact in double on both
    * engines; one final division by 63 is the only rounding step.
    *
    * Shape: pruned scan → map-side-combined hourly aggregate →
    * zero-filled dense grid (silent hour = count 0, a real
    * observation) → six `lag`s in ONE window pass. Scale: same
    * per-key window argument as [[interpolate]] — key cardinality is
    * the parallelism, and the grid bounds every key to |hours| rows.
    */
  def ewmaAnomaly(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lo = graft.SqlCompat.utcTimestamp("2024-01-01 00:00:00")
    val hours = 720 // Jan 1-30
    val ev = Tables(spark, dir).events
    val counts = ev
      .select($"event_type",
        (floor((unix_timestamp($"ts") - unix_timestamp(lit(lo))) / 3600L))
          .cast("int").as("idx"))
      .where($"idx" >= 0 && $"idx" < hours)
      .groupBy($"event_type", $"idx")
      .agg(count(lit(1)).as("n"))
    val types = ev.select($"event_type").distinct()
    val grid = types.crossJoin(broadcast(
      spark.range(0, hours).select($"id".cast("int").as("idx"))))
    val w = Window.partitionBy($"event_type").orderBy($"idx")
    val filled = grid.join(counts, Seq("event_type", "idx"), "left")
      .select($"event_type", $"idx", coalesce($"n", lit(0L)).as("n"))
    val lags = (1 to 6).foldLeft(filled) { (df, k) =>
      df.withColumn(s"l$k", lag($"n", k).over(w))
    }
    lags.where($"idx" >= 6)
      .withColumn("ewma",
        (lit(32.0) * $"l1" + lit(16.0) * $"l2" + lit(8.0) * $"l3" +
          lit(4.0) * $"l4" + lit(2.0) * $"l5" + lit(1.0) * $"l6") / lit(63.0))
      .select($"event_type",
        (lit(lo).cast("timestamp") +
          expr("make_interval(0,0,0,0, idx, 0, 0)")).as("hour"),
        $"n", $"ewma",
        ($"n".cast("double") > lit(2.0) * $"ewma" ||
          $"n".cast("double") < lit(0.5) * $"ewma").as("anomaly"))
      .orderBy($"event_type", $"hour")
  }

  /** CEP-style sequence pattern detection (the Flink-CEP /
    * MATCH_RECOGNIZE shape): every CONSECUTIVE `error → error →
    * purchase` run inside a user's timeline — "two failures
    * immediately before a conversion", the classic friction-funnel
    * pattern — with the pattern's wall-clock span emitted so callers
    * bound it downstream. One user-partitioned window pass builds the
    * lookahead (two leads), the pattern is a scan-stage predicate
    * over it — no self-joins, no per-row backtracking, and state per
    * user is the 2-event lookahead, so the shape holds on an
    * unbounded 100 TB event log.
    */
  def patternMatch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables(spark, dir).events
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("t1", lead($"event_type", 1).over(w))
      .withColumn("t2", lead($"event_type", 2).over(w))
      .withColumn("id1", lead($"event_id", 1).over(w))
      .withColumn("id2", lead($"event_id", 2).over(w))
      .withColumn("us2", lead(unix_micros($"ts"), 2).over(w))
      .where($"event_type" === "error" && $"t1" === "error" && $"t2" === "purchase")
      .select($"user_id", $"event_id".as("first_error"),
        $"id1".as("second_error"), $"id2".as("purchase_id"),
        ($"us2" - unix_micros($"ts")).as("span_us"))
      .orderBy($"user_id", $"first_error")
  }

  /** Step latency: for every (event_type → next event_type) transition
    * within a user's timeline, the count and EXACT interpolated p50 /
    * p90 of the gap (microseconds). Gaps build in the same
    * user-partitioned lead pass as [[eventTransitions]]; the exact
    * percentile sorts only within each (from, to) group — group count
    * is |types|², so the percentile state is bounded however large
    * the corpus. Both engines use the R-7 interpolation convention
    * over exact integer µs, so the doubles match bit-for-bit.
    */
  def stepLatency(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val gaps = Tables(spark, dir).events
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("next_type", lead($"event_type", 1).over(w))
      .withColumn("gap_us", lead(unix_micros($"ts"), 1).over(w) - unix_micros($"ts"))
      .where($"next_type".isNotNull)
    gaps.groupBy($"event_type".as("from_type"), $"next_type".as("to_type"))
      .agg(count(lit(1)).as("n"),
        expr("percentile(gap_us, 0.5)").as("p50_us"),
        expr("percentile(gap_us, 0.9)").as("p90_us"))
      .orderBy($"from_type", $"to_type")
  }

  /** Exact audience segments as Roaring bitmaps: distinct users per
    * event_type ([[graft.functions.BitmapAggExpr]]) plus each
    * segment's overlap with the `purchase` segment — the overlap is
    * SET ALGEBRA over the already-aggregated bitmaps
    * (`bitmap64_and_count`), not a second scan of raw events. At 100 TB
    * this is the ClickHouse `groupBitmap` / Druid-segment plan:
    * map-side partials ship one compressed bitmap per group per
    * partition instead of every distinct id, and any follow-up
    * overlap/retention question is answered from the segments alone.
    */
  def bitmapDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.BitmapFunctions._
    val seg = Tables(spark, dir).events
      .groupBy($"event_type")
      .agg(bitmap64_agg($"user_id").as("bm"))
    val purchase = seg.where($"event_type" === "purchase").select($"bm".as("pbm"))
    // LEFT join against the (0-or-1-row) comparison segment: a corpus
    // with no 'purchase' events must yield every event_type with a 0
    // overlap, not an empty result (the oracle's LEFT JOIN + coalesce)
    seg.join(broadcast(purchase), lit(true), "left")
      .select($"event_type",
        bitmap64_count($"bm").as("n_users"),
        coalesce(bitmap64_and_count($"bm", $"pbm"), lit(0L)).as("n_also_purchase"))
      .orderBy($"event_type")
  }

  /** Rolling-window distinct users (DAU + trailing-7-day WAU) per
    * event_type — THE non-additive metric: a week's distinct count is
    * not the sum of its days, so the classic answer re-scans the fact
    * table once per window. Bitmap segments make it one scan total:
    * daily per-type segments aggregate once
    * ([[graft.functions.BitmapAggExpr]]), then every (type, day)
    * OR-merges its trailing week of DAILY segments
    * ([[graft.functions.BitmapOrAggExpr]]) — a frame bounded by
    * |types|×|days| rows regardless of corpus size. At 100 TB the
    * fact table is read exactly once; the rolling pass touches only
    * aggregate output.
    */
  def rollingDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.BitmapFunctions._
    val daily = Tables(spark, dir).events
      .select($"event_type", to_date($"ts").as("day"), $"user_id")
      .groupBy($"event_type", $"day")
      .agg(bitmap64_agg($"user_id").as("bm"))
      .withColumn("dau", bitmap64_count($"bm"))
    daily.as("a").join(daily.as("b"),
        $"a.event_type" === $"b.event_type" &&
          $"b.day" >= date_sub($"a.day", 6) && $"b.day" <= $"a.day")
      .groupBy($"a.event_type".as("event_type"), $"a.day".as("day"))
      .agg(max(when($"b.day" === $"a.day", $"b.dau")).as("dau"),
        bitmap64_count(bitmap64_or_agg($"b.bm")).as("wau"))
      .orderBy($"event_type", $"day")
  }

  /** Per-group OLS trend: regression of `value` on event time (slope
    * per day, intercept at the group's first event, R²) for each
    * event_type. The five raw moments (Σx, Σx², Σy, Σy², Σxy)
    * accumulate EXACTLY — x is whole epoch seconds re-based to the
    * group minimum (`div` keeps it integral; re-basing keeps x² small
    * enough that nothing saturates), y routes through DECIMAL(18,4) —
    * so both engines reduce identical rationals regardless of row
    * order, and the closed-form slope/intercept/R² are then a fixed
    * dag of IEEE double ops. Shape: a tiny per-group min aggregate
    * broadcast back, then ONE map-side-combined moment aggregate —
    * the scan-shaped "fit a trend per key" primitive (drift monitors,
    * burn-rate alerts); no per-key iteration, no driver math, and at
    * 100 TB the moment pass shuffles 6 numbers per key.
    */
  def regrTrend(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables(spark, dir).events
      .select($"event_type", expr("unix_micros(ts) div 1000000").as("sec"),
        dec($"value").as("y"))
    val mins = ev.groupBy($"event_type").agg(min($"sec").as("m"))
    val mom = ev.join(broadcast(mins), Seq("event_type"))
      .select($"event_type", ($"sec" - $"m").as("x"), $"y")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"x").cast("double").as("sx"),
        // x ≤ the group's time span in seconds, so x·x stays a safe
        // long; the decimal cast is on the exact SUM side only
        sum(($"x" * $"x").cast("decimal(38,0)")).cast("double").as("sxx"),
        sum($"y").cast("double").as("sy"),
        sum($"y" * $"y").cast("double").as("syy"),
        sum($"x".cast("decimal(14,0)") * $"y").cast("double").as("sxy"))
    // written as the same op-dag on both sides: double arithmetic is
    // deterministic once the inputs (exact-sum casts) are identical
    val n = $"n".cast("double")
    val vx = n * $"sxx" - $"sx" * $"sx"
    val vy = n * $"syy" - $"sy" * $"sy"
    val cov = n * $"sxy" - $"sx" * $"sy"
    mom.select($"event_type", $"n",
        (cov / vx * lit(86400.0)).as("slope_per_day"),
        (($"sy" - cov / vx * $"sx") / n).as("intercept"),
        (cov * cov / (vx * vy)).as("r2"))
      .orderBy($"event_type")
  }

  /** Lag-1 autocorrelation of `value` per event_type (serial
    * dependence — the complement of [[regrTrend]]'s deterministic
    * trend): consecutive-event pairs by (ts, event_id) within the
    * group, then Pearson r over the pairs from exact decimal moments
    * (same cross-engine determinism argument as [[regrTrend]]). One
    * window pass builds the pairs (shuffle on event_type, sort by
    * time), one aggregate reduces them; at 100 TB the window key is
    * the parallelism unit and the aggregate output is one row per key.
    */
  def autocorr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"event_type").orderBy($"ts", $"event_id")
    val pairs = Tables(spark, dir).events
      .select($"event_type", $"ts", $"event_id", dec($"value").as("y"))
      .withColumn("x", lag($"y", 1).over(w))
      .where($"x".isNotNull)
    pairs.groupBy($"event_type")
      .agg(count(lit(1)).as("n_pairs"),
        sum($"x").cast("double").as("sx"),
        sum($"x" * $"x").cast("double").as("sxx"),
        sum($"y").cast("double").as("sy"),
        sum($"y" * $"y").cast("double").as("syy"),
        sum($"x" * $"y").cast("double").as("sxy"))
      .select($"event_type", $"n_pairs", {
        val n = $"n_pairs".cast("double")
        ((n * $"sxy" - $"sx" * $"sy") /
          (sqrt(n * $"sxx" - $"sx" * $"sx") * sqrt(n * $"syy" - $"sy" * $"sy")))
          .as("autocorr")
      })
      .orderBy($"event_type")
  }

  /** Benford first-digit QC: the distribution of leading significant
    * digits of `value` against Benford's law — the classic fabricated-
    * data / instrumentation-bug screen. The digit is extracted from
    * the DECIMAL(18,4) rendering (both engines print decimals with
    * fixed scale, so `[1-9]` first-match is engine-stable — no
    * float-formatting or log10-at-a-power-boundary hazards), making
    * the whole query one scan-stage projection plus a 9-row aggregate;
    * at 100 TB it is a single map-side-combined count.
    */
  def benfordDigits(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val digits = Tables(spark, dir).events
      .where($"value" > 0)
      .select(regexp_extract(dec($"value").cast("string"), "[1-9]", 0)
        .cast("int").as("digit"))
    val counts = digits.groupBy($"digit").agg(count(lit(1)).as("n"))
    val total = Window.partitionBy()
    counts
      .select($"digit", $"n",
        ($"n".cast("double") / sum($"n").over(total).cast("double")).as("observed"),
        log10(lit(1.0) + lit(1.0) / $"digit".cast("double")).as("expected"))
      .orderBy($"digit")
  }
}
