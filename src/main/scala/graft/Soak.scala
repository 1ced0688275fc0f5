package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-soak harness (VERDICT r8 item 6): run the heaviest LLM-pipeline
  * queries one scale DECADE above the bench corpus and measure the
  * time-vs-size exponent of each.
  *
  * Both corpora are SYNTHETIC and come from the same seeded generator —
  * comparing real-sf0.1 against a 10× synthetic slice would conflate
  * content distribution with size, and a replicated corpus (10 copies
  * of sf0.1) would inject adversarial all-pairs near-dup density no
  * real crawl has. The generator is fully distributed (spark.range +
  * hash-derived columns; no driver loops, no RNG state) and Zipf-skews
  * the vocabulary so shingle/token collision rates resemble text.
  *
  * Output: one JSON line per query with t(1x), t(10x) and the fitted
  * exponent log10(t10/t1) — ~1.0 = linear scaling, the 100 TB pass
  * criterion for these operators (their shuffles are index- or
  * parameter-bounded; quadratic blowup would surface here first).
  * Results are recorded in SCALE.md.
  */
object Soak {

  /** Zipf-ish word index in [0, vocab): 20% of positions draw from the
    * 1%-head of the vocabulary, the rest uniformly — enough head
    * re-use for realistic shingle collisions without degenerate text.
    */
  private def wordIdx(h1: org.apache.spark.sql.Column, h2: org.apache.spark.sql.Column,
                      vocab: Int) =
    when(pmod(h2, lit(5)) === 0, pmod(h1, lit(math.max(vocab / 100, 1))))
      .otherwise(pmod(h1, lit(vocab)))

  def genDocuments(spark: SparkSession, n: Long, vocab: Int = 20000): DataFrame = {
    val words = transform(
      sequence(lit(1), (lit(40) + pmod(xxhash64(col("doc_id"), lit(7)), lit(200))).cast("int")),
      j => concat(lit("w"),
        wordIdx(xxhash64(col("doc_id"), j, lit(11)), xxhash64(col("doc_id"), j, lit(13)), vocab)))
    spark.range(n).select(col("id").as("doc_id"))
      .withColumn("text", concat_ws(" ", words))
      .withColumn("lang", element_at(array(lit("en"), lit("de"), lit("fr"), lit("es"), lit("pt")),
        (pmod(xxhash64(col("doc_id"), lit(17)), lit(5)) + 1).cast("int")))
      .withColumn("source", element_at(array(lit("web"), lit("wiki"), lit("books"), lit("code")),
        (pmod(xxhash64(col("doc_id"), lit(19)), lit(4)) + 1).cast("int")))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  def genEmbeddings(spark: SparkSession, n: Long, dim: Int = 64): DataFrame =
    spark.range(n).select(col("id").as("vec_id"))
      .withColumn("embedding", transform(sequence(lit(0), lit(dim - 1)),
        k => ((pmod(xxhash64(col("vec_id"), k, lit(23)), lit(2001)) - 1000) / 1000.0)
          .cast("float")))
      .withColumn("label", pmod(xxhash64(col("vec_id"), lit(29)), lit(10)).cast("int"))

  def genEvents(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(col("id").as("event_id"))
      .withColumn("ts", timestamp_micros(
        lit(1706400000000000L) + col("event_id") * 125000L +
          pmod(xxhash64(col("event_id"), lit(31)), lit(900000000L))))
      .withColumn("user_id", pmod(xxhash64(col("event_id"), lit(37)), lit(n / 20 + 1)))
      .withColumn("event_type", element_at(
        array(lit("view"), lit("click"), lit("purchase"), lit("signup"), lit("error")),
        (pmod(xxhash64(col("event_id"), lit(41)), lit(5)) + 1).cast("int")))
      .withColumn("value", (pmod(xxhash64(col("event_id"), lit(43)), lit(100000)) / 1000.0))
      .withColumn("props", concat(lit("""{"k":"""),
        pmod(xxhash64(col("event_id"), lit(47)), lit(100)), lit("}")))

  def genDir(spark: SparkSession, dir: String, docs: Long, vecs: Long, events: Long): Unit = {
    genDocuments(spark, docs).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    genEmbeddings(spark, vecs).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    genEvents(spark, events).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private val Heavy = Seq(
    "s_incremental_dedup", "d_dedup_clusters", "d_ngram_containment",
    "d_ngram_jaccard", "e_semdedup_kmeans", "e_cosine_ivfpq_topk",
    "t_textrank", "pipeline_traindata",
    // r10 at-ingest contamination screen: 10× docs scales BOTH the
    // benchmark 4-gram index and the arrival stream — per-trigger
    // cost must track the batch (bucket-pruned index reads), so the
    // decade exponent is the O(batch) claim measured directly
    "s_incremental_contamination")

  /** MV-stack refresh soak (VERDICT r9 item 5): the join-view and
    * rollup refreshes claim O(changes) cost — "the refresh itself
    * shuffles only the delta". Measured directly: build the
    * enrich→rollup stack over a base of `n` fact rows, then commit a
    * FIXED-size delta and time ONLY the two refreshes. Scaling the
    * BASE a decade with the delta held constant must leave refresh
    * time ~flat (exponent ≈ 0 against base size); a refresh that
    * secretly rescans the fact table would show exponent ≈ 1 here.
    * Returns (joinViewRefreshSec, rollupRefreshSec).
    */
  def soakMvRefresh(spark: SparkSession, n: Long, deltaRows: Long): (Double, Double) = {
    import graft.lake.{DmlStrategy, IncrementalView, JoinView, LakeCatalog, WriteMode}
    import graft.lake.IncrementalView.{GroupCount, Sum}
    val cat = new LakeCatalog(spark,
      java.nio.file.Files.createTempDirectory("graft-soak-mv-").toString)
    val fact = genEvents(spark, n)
      .select(col("event_id"), col("user_id"), col("event_type"),
        (col("value") * 1000).cast("long").as("millis"))
    val dim = spark.range(n / 20 + 1).select(col("id").as("user_id"))
      .withColumn("segment", concat(lit("seg"), pmod(xxhash64(col("user_id"), lit(53)), lit(8))))
    // key stats declared as any production fact table would: without
    // them NO file-skip is possible and the bounded refresh read
    // degrades to a scan-with-filter (the r12 third-decade knee —
    // 0.80/decade — was exactly this fixture omission compounding the
    // old 1k In-pushdown cap)
    cat.write(fact.repartition(32), "f.events", WriteMode.Overwrite,
      statsBy = Seq("event_id"))
    cat.write(dim.repartition(4), "d.users", WriteMode.Overwrite,
      statsBy = Seq("user_id"))
    def refreshJoin() = JoinView.refresh(cat, "f.events", "d.users",
      "v.enriched", factKey = "event_id", joinKey = "user_id",
      dimKey = "user_id", dimCols = Seq("segment"),
      strategy = DmlStrategy.MergeOnRead)
    val aggs = Seq(GroupCount("n"), Sum(col("millis"), "sum_millis"))
    def refreshRollup() = IncrementalView.refresh(cat, "v.enriched",
      "g.rollup", Seq("segment", "event_type"), aggs)
    refreshJoin(); refreshRollup() // full builds, untimed
    // fixed-size delta: new event_ids above the base range
    val delta = genEvents(spark, deltaRows)
      .select((col("event_id") + n).as("event_id"),
        col("user_id"), col("event_type"),
        (col("value") * 1000).cast("long").as("millis"))
      .withColumn("user_id", pmod(col("user_id"), lit(n / 20 + 1)))
    cat.write(delta.repartition(4), "f.events", WriteMode.Append)
    val t0 = System.nanoTime()
    val jv = refreshJoin()
    val t1 = System.nanoTime()
    val ru = refreshRollup()
    val t2 = System.nanoTime()
    require(jv.meta.get(IncrementalView.RefreshModeKey).contains("incremental"),
      s"join-view refresh must be incremental, got meta ${jv.meta}")
    require(ru.meta(IncrementalView.RefreshModeKey) == "incremental",
      "rollup refresh must consume the view's changelog, not rebuild")
    ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
  }

  /** Catalog-wide erasure soak (VERDICT r10 item 5): `forgetCatalog`
    * claims O(per-table) cost — discovery plus a bounded COW delete
    * per table holding the key column, parallelized across tables.
    * Measured directly: build a catalog of `tables` tables of
    * `rowsPerTable` events each (all keyed `user_id`), erase the same
    * 3 subjects catalog-wide, return the wall. Scaling TABLE COUNT a
    * decade at fixed per-table size should scale the wall ≤ linearly
    * (exponent ≤ 1 vs table count; < 1 to the extent the per-table
    * erasures overlap) — a super-linear exponent would mean discovery
    * or erasure secretly does cross-table work.
    */
  def soakForgetCatalog(spark: SparkSession, tables: Int,
                        rowsPerTable: Long): Double = {
    import graft.lake.{LakeCatalog, Privacy, WriteMode}
    val cat = new LakeCatalog(spark,
      java.nio.file.Files.createTempDirectory("graft-soak-forget-").toString)
    val users = rowsPerTable / 20 + 1
    (0 until tables).foreach { i =>
      val df = genEvents(spark, rowsPerTable)
        .withColumn("user_id", pmod(xxhash64(col("event_id"), lit(37 + i)), lit(users)))
      cat.write(df.repartition(4), s"s$i.events", WriteMode.Overwrite)
    }
    val subjects: Seq[Any] = Seq(1L, 2L, 3L)
    val t0 = System.nanoTime()
    val results = Privacy.forgetCatalog(cat, "user_id", subjects)
    val wall = (System.nanoTime() - t0) / 1e9
    require(results.size >= tables, s"expected >= $tables erasure results, got ${results.size}")
    require(results.forall(_.residualRows == 0), "residual rows after catalog erasure")
    wall
  }

  def main(args: Array[String]): Unit = {
    val base = if (args.nonEmpty) args(0) else "/tmp/graft-soak"
    // optional stage filter: "heavy" | "mv" | "forget" | "all" (default),
    // plus the opt-in long stages "mv100m" (third MV decade: 10M → 100M
    // base, where file-count effects could bend the O(changes) claim)
    // and "contam100" (contamination screen's second decade, 10× → 100×
    // docs) — excluded from "all" to keep the per-round soak bounded
    val stage = if (args.length > 1) args(1) else "all"
    // fail loud on a typo'd stage — silently running nothing would
    // also overwrite SOAK_LAST.json with an empty array
    require(Set("all", "heavy", "mv", "forget", "mv100m", "contam100")(stage),
      s"unknown soak stage '$stage'; want heavy | mv | forget | all | mv100m | contam100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-soak")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val runHeavy = stage == "all" || stage == "heavy"
    val runMv = stage == "all" || stage == "mv"
    val runForget = stage == "all" || stage == "forget"

    // 1x mirrors sf0.1's table sizes; 10x is the soak decade
    val d1 = s"$base/x1"; val d10 = s"$base/x10"
    if (runHeavy) {
      genDir(spark, d1, docs = 5000L, vecs = 2000L, events = 100000L)
      genDir(spark, d10, docs = 50000L, vecs = 20000L, events = 1000000L)
    }

    def force(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    // shuffle-node census of the FINAL (AQE-resolved) plan: scale-up
    // must change data volume, not plan shape — a new exchange at 10×
    // would mean some operator fell off its broadcast/bucketed path
    def countEx(p: org.apache.spark.sql.execution.SparkPlan): Int = {
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
      val self = p match { case _: ShuffleExchangeLike => 1; case _ => 0 }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec        => Seq(q.plan)
        case other                    => other.children
      }
      self + kids.map(countEx).sum
    }
    def time(name: String, dir: String): (Double, Int) = {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      force(df)
      ((System.nanoTime() - t0) / 1e9, countEx(df.queryExecution.executedPlan))
    }
    // warm both fixture families once
    if (runHeavy) Seq(d1).foreach { d =>
      try { force(SparkEntry.queries("t_fingerprint")(spark, d))
        force(SparkEntry.queries("e_cosine_topk")(spark, d)) }
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[soak] warmup failed: ${e.getMessage}") }
    }
    val rows = if (!runHeavy) Nil else Heavy.map { name =>
      val (t1, e1) = time(name, d1)
      val (t10, e10) = time(name, d10)
      val exp = math.log10(t10 / t1)
      val line = f"""{"query":"$name","t1x_sec":$t1%.2f,"t10x_sec":$t10%.2f,""" +
        f""""exponent":$exp%.2f,"exchanges_1x":$e1,"exchanges_10x":$e10,""" +
        s""""shape_stable":${e1 == e10}}"""
      println(line)
      line
    }
    // MV-stack refresh: fixed 5k-row delta against a 100k, 1M, and
    // 10M base — exponent vs BASE size across TWO decades, ≈0 proves
    // the O(changes) claim (a refresh that secretly rescanned the
    // fact table would show ≈1 per decade)
    val mvRows = if (!runMv) Nil else {
      val (jv1, ru1) = soakMvRefresh(spark, n = 100000L, deltaRows = 5000L)
      val (jv10, ru10) = soakMvRefresh(spark, n = 1000000L, deltaRows = 5000L)
      val (jv100, ru100) = soakMvRefresh(spark, n = 10000000L, deltaRows = 5000L)
      def row(q: String, t1: Double, t10: Double, t100: Double) =
        f"""{"query":"$q","t1x_sec":$t1%.2f,"t10x_sec":$t10%.2f,"t100x_sec":$t100%.2f,""" +
          f""""exponent_10x":${math.log10(t10 / t1)}%.2f,"exponent_100x":${math.log10(t100 / t1) / 2}%.2f,""" +
          s""""fixed_delta_rows":5000}"""
      Seq(row("mv_joinview_refresh", jv1, jv10, jv100),
        row("mv_rollup_refresh", ru1, ru10, ru100))
    }
    mvRows.foreach(println)
    // catalog-wide erasure: 4 → 40 tables at fixed per-table size;
    // exponent vs TABLE COUNT ≤ 1 is the O(per-table) claim
    val forgetRows = if (!runForget) Nil else {
      val rowsPerTable = 100000L
      val t4 = soakForgetCatalog(spark, tables = 4, rowsPerTable = rowsPerTable)
      val t40 = soakForgetCatalog(spark, tables = 40, rowsPerTable = rowsPerTable)
      val line = f"""{"query":"forget_catalog","t_4tables_sec":$t4%.2f,""" +
        f""""t_40tables_sec":$t40%.2f,"exponent_vs_tables":${math.log10(t40 / t4)}%.2f,""" +
        s""""rows_per_table":$rowsPerTable}"""
      println(line)
      Seq(line)
    }
    // third MV decade: 10M and 100M base in ONE session (same-box
    // comparability), fixed 5k delta — the knee test for file-count
    // effects on the O(changes) refresh claim
    val mv100Rows = if (stage != "mv100m") Nil else {
      sys.props("graft.stream.profile") = "1" // phase walls on stderr
      val (jvA, ruA) = soakMvRefresh(spark, n = 10000000L, deltaRows = 5000L)
      val (jvB, ruB) = soakMvRefresh(spark, n = 100000000L, deltaRows = 5000L)
      def row(q: String, tA: Double, tB: Double) =
        f"""{"query":"$q","t_10m_sec":$tA%.2f,"t_100m_sec":$tB%.2f,""" +
          f""""exponent_decade":${math.log10(tB / tA)}%.2f,"fixed_delta_rows":5000}"""
      val lines = Seq(row("mv_joinview_refresh_3rd_decade", jvA, jvB),
        row("mv_rollup_refresh_3rd_decade", ruA, ruB))
      lines.foreach(println)
      lines
    }
    // contamination screen's second decade: 10× → 100× documents
    // scales both the benchmark 4-gram index and the arrival stream
    val contamRows = if (stage != "contam100") Nil else {
      val d10c = s"$base/x10"; val d100c = s"$base/x100"
      genDir(spark, d10c, docs = 50000L, vecs = 2000L, events = 100000L)
      genDocuments(spark, 500000L).write.mode("overwrite")
        .parquet(s"$d100c/documents.parquet")
      val (t10, e10) = time("s_incremental_contamination", d10c)
      val (t100, e100) = time("s_incremental_contamination", d100c)
      // the bucket-sizing hypothesis, measured: if per-trigger cost
      // were index-slice-dominated, 10× the buckets would cut it.
      // NOTE the ordering bias: this run re-reads parquet the t100
      // run just warmed, so the page cache FAVORS it — a result where
      // it still loses (r12: 100.6 vs 85.7 s — per-trigger cost is
      // batch-dominated at this size) survives the bias; a win here
      // would need a cold re-measure before being believed.
      val docs100 = spark.read.parquet(s"$d100c/documents.parquet")
      val tb0 = System.nanoTime()
      force(graft.ops.IncrementalContamination.screenAtIngest(spark,
        docs100.filter(col("doc_id") % 50 === 0),
        docs100.filter(col("doc_id") % 50 =!= 0),
        java.nio.file.Files.createTempDirectory("graft-soak-contamb-"),
        indexBuckets = 160))
      val tb = (System.nanoTime() - tb0) / 1e9
      val line = f"""{"query":"s_incremental_contamination_2nd_decade",""" +
        f""""t10x_sec":$t10%.2f,"t100x_sec":$t100%.2f,""" +
        f""""t100x_buckets160_sec":$tb%.2f,""" +
        f""""exponent_decade":${math.log10(t100 / t10)}%.2f,""" +
        s""""exchanges_10x":$e10,"exchanges_100x":$e100,""" +
        s""""shape_stable":${e10 == e100}}"""
      println(line)
      Seq(line)
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_SOAK_OUT", "SOAK_LAST.json")),
      (rows ++ mvRows ++ forgetRows ++ mv100Rows ++ contamRows)
        .mkString("[", ",\n", "]\n"))
    spark.stop()
  }
}
