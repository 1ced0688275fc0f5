package graft.queries

import graft.{SqlCompat, Tables}
import graft.SqlCompat._
import graft.ops.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis queries over the `documents` table (north-star
  * LLM-pipeline operators). Pure narrow transforms — they run inside
  * whole-stage codegen in the scan stage; the only shuffles are the
  * final small aggregations.
  */
object TextQueries {

  /** Language-ID confusion matrix: labeled lang × heuristic prediction. */
  def langIdConfusion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).documents
      .select($"lang", TextOps.langId($"text").as("pred"))
      .groupBy($"lang", $"pred")
      .agg(count(lit(1)).as("n"))
      .orderBy($"lang", $"pred")
  }

  /** Per-document quality signals + rule bucket (Gopher/C4-style). */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir).documents
    t.select(
        $"doc_id",
        TextOps.wordCount($"text").as("n_words"),
        TextOps.tokenCount($"text").as("n_tokens"),
        TextOps.punctCount($"text").as("n_punct"),
        TextOps.stopwordRatio($"text").as("stop_ratio"),
        $"n_chars")
      .withColumn("bucket",
        TextOps.qualityBucket($"n_words", $"n_chars", $"n_punct", $"stop_ratio"))
      .select($"doc_id", $"n_words", $"n_tokens", $"n_punct", $"stop_ratio", $"bucket")
      .orderBy($"doc_id")
  }

  /** Corpus token statistics per source (the budget/mixture report
    * every training-data pipeline runs).
    */
  def tokenStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).documents
      .select($"source", TextOps.tokenCount($"text").as("n_tokens"), $"n_chars")
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_tokens").as("total_tokens"),
        max($"n_tokens").as("max_tokens"),
        sum($"n_chars").as("total_chars"))
      .orderBy($"source")
  }

  /** Per-document normalized-text fingerprint (exact-dedup key). */
  def fingerprints(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).documents
      .select($"doc_id", TextOps.fingerprint($"text").as("fp"))
      .orderBy($"doc_id")
  }

  /** End-to-end training-data curation — the composite pipeline every
    * LLM corpus build runs, chaining the north-star operators in their
    * production order:
    *   1. rule-based quality filter (keep bucket = good),
    *   2. language filter (heuristic langId ∈ {en, de, fr, es}),
    *   3. exact dedup (keep min doc_id per normalized fingerprint),
    *   4. near-dup dedup (MinHash-LSH candidates, exact-verified at
    *      jaccard ≥ 0.5 → connected components → keep each cluster's
    *      min id) — the LSH path IS the production choice at corpus
    *      scale, and at the fixture's similarity margins its verified
    *      pair set provably equals the exhaustive jaccard join the
    *      DuckDB oracle states (same argument as d_dedup_minhash),
    *   5. token-budget report per language.
    * Every stage is a narrow transform or density-bounded pair join —
    * the whole pipeline is one Spark plan per stage group, no
    * collect(), linear at corpus scale.
    */
  def trainingMix(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables(spark, dir).documents
    val scored = docs.select($"doc_id", $"lang", $"text", $"n_chars",
        TextOps.wordCount($"text").as("n_words"),
        TextOps.tokenCount($"text").as("n_tokens"),
        TextOps.punctCount($"text").as("n_punct"),
        TextOps.stopwordRatio($"text").as("stop_ratio"),
        TextOps.langId($"text").as("pred"))
      .where(TextOps.qualityBucket($"n_words", $"n_chars", $"n_punct", $"stop_ratio") === "good")
      .where($"pred".isin("en", "de", "fr", "es"))
    // exact dedup: canonical doc per fingerprint
    val exact = scored
      .withColumn("fp", TextOps.fingerprint($"text"))
      .withColumn("keep", $"doc_id" === min($"doc_id")
        .over(org.apache.spark.sql.expressions.Window.partitionBy($"fp")))
      .where($"keep").drop("fp", "keep")
    // near-dup dedup on the survivors (LSH candidates, exact verify)
    val pairs = graft.ops.Dedup.minHashLshPairs(exact, threshold = 0.5,
      numHashes = 96, bands = 24)
    val kept = graft.ops.Dedup.dedupByClusters(exact, pairs)
    kept.groupBy($"lang", $"pred")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_tokens".cast("long")).as("total_tokens"))
      .orderBy($"lang", $"pred")
  }

  /** Deterministic hash sampling — the reproducible downsampling every
    * mixture build uses (seeded `sample()` is engine- and
    * partitioning-dependent; a content hash is not): keep a document
    * iff md5(doc_id) mod 100 < rate. Portable md5 arithmetic, so the
    * DuckDB oracle reproduces the exact selection; at 100 TB this is a
    * stateless narrow filter in the scan stage — no shuffle, no
    * coordination, stable under retries and repartitioning.
    */
  def hashSample(spark: SparkSession, dir: String, ratePct: Int = 37): DataFrame = {
    import spark.implicits._
    val bucket = conv(substring(md5($"doc_id".cast("string")), 1, 8), 16, 10)
      .cast("long") % 100
    Tables(spark, dir).documents
      .where(bucket < ratePct)
      .select($"doc_id", $"source", $"lang")
      .orderBy($"doc_id")
  }

  /** Token-budget mixture selection: per source, admit documents in
    * doc_id order while the running token total stays within budget —
    * the "fill each mixture component to N tokens" step of corpus
    * assembly. One window cumsum per source partition; at 100 TB the
    * shuffle is by source (bounded key space) and everything else is
    * scan-stage.
    */
  def tokenBudget(spark: SparkSession, dir: String, budget: Long = 20000L): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    Tables(spark, dir).documents
      .select($"source", $"doc_id", TextOps.tokenCount($"text").cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum($"n_tokens").over(w))
      .where($"cum_tokens" <= budget)
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_tokens").as("tokens_kept"),
        max($"doc_id").as("last_doc_id"))
      .orderBy($"source")
  }

  /** Winnowing overlap detection: doc pairs sharing ≥ `minShared`
    * rolling-hash fingerprints (substring-level near-dup, robust to
    * word reordering outside the shared runs). Inverted-index join on
    * fingerprints — same scale shape as the shingle Jaccard join.
    */
  def winnowOverlap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fp = Tables(spark, dir).documents
      .select($"doc_id", explode(TextOps.winnowFingerprints($"text", 8, 4)).as("fp"))
    // drop ubiquitous fingerprints (boilerplate phrases): bounds the
    // inverted-index join fan-out by df² — the MOSS "ignore common
    // fingerprints" step, essential at corpus scale. The COMMON set is
    // the tiny one — anti-join against it (broadcasting the rare set
    // would ship O(corpus) rows to every executor)
    val common = fp.groupBy($"fp").agg(count(lit(1)).as("df"))
      .where($"df" > 20).select($"fp")
    val filtered = fp.join(broadcast(common), Seq("fp"), "left_anti")
    val a = filtered.select($"fp", $"doc_id".as("a_id"))
    val b = filtered.select($"fp", $"doc_id".as("b_id"))
    a.join(b, Seq("fp"))
      .where($"a_id" < $"b_id")
      .groupBy($"a_id", $"b_id")
      .agg(count(lit(1)).as("shared_fp"))
      .orderBy($"shared_fp".desc, $"a_id", $"b_id")
      .limit(100)
  }
}
