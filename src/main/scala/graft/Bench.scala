package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, one JSON line on stdout.
  *
  * Work is forced through the `noop` sink (full computation of every
  * output column, nothing collected) rather than `count()`, which
  * would let Catalyst prune the projection and under-measure. A small
  * warmup query first absorbs JIT/codegen/session costs so per-query
  * numbers reflect steady state.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // INT64-micros timestamps: parquet footers then carry real
      // min/max stats (INT96 gets none), powering write-time stats
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions) // SQL DML over lake tables
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // warmup: parquet readers, codegen, and shuffle machinery for each
    // fixture family — lineitem (q1), documents (fingerprint), and
    // embeddings (cosine top-k) — so per-query numbers measure steady
    // state rather than whichever query alphabetically pays the cold
    // reader/JIT cost for its table. (Failures fall through to the
    // measured, per-query-guarded loop.)
    Seq("q1_pricing_summary", "t_fingerprint", "e_cosine_topk").foreach { w =>
      try force(SparkEntry.queries(w)(spark, sfDir))
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] warmup $w failed: ${e.getMessage}") }
    }

    // median-of-N (default 3): single-run numbers on a shared box carry
    // ±15% noise that dominates round-over-round comparisons; the
    // median absorbs one bad run per query. Runs iterate run-major so
    // cross-run cache state is uniform across queries.
    val runs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt)
    // local-iteration filter: comma-separated query names (unset = all)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val timings = scala.collection.mutable.Map.empty[String, List[Double]]
    for (_ <- 1 to runs; name <- names) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val ok =
        try { force(fn(spark, sfDir)); true }
        catch { case scala.util.control.NonFatal(e) =>
          // fatal errors (OOM) propagate: timings from a corrupted JVM
          // would be recorded as real numbers
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      if (ok) timings(name) = ((System.nanoTime() - t0) / 1e9) :: timings.getOrElse(name, Nil)
    }
    def median(xs: List[Double]): Double = {
      val s = xs.sorted
      s(s.size / 2) // upper median: pessimistic on even counts
    }
    // -1 keeps queries that failed EVERY run machine-detectable
    val results = names.map(n =>
      n -> timings.get(n).filter(_.nonEmpty).map(median).getOrElse(-1.0))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // failures (-1 markers) must not shrink the total
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val failed = results.count(_._2 < 0)
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"runs":$runs,"sf":"$sfDir"}"""
    println(json)
    // the captured stdout tail is bounded and has truncated per-query
    // numbers before (BENCH_r03 lost its head) — the file is the
    // complete, authoritative record
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LAST.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] could not write $out: ${e.getMessage}") }
    spark.stop()
  }
}
