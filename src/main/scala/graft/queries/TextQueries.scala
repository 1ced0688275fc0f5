package graft.queries

import graft.{SqlCompat, Tables}
import graft.SqlCompat._
import graft.TablesSpread.spread
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

  /** Stratified sampling with exact per-stratum quotas: rank each
    * (source, lang) stratum by a PORTABLE deterministic hash (md5 of
    * the doc id, doc_id tiebreak) and keep the first `quota` — the
    * "equal representation across sources and languages" sampling
    * step of corpus construction, reproducible under retries, any
    * partitioning, and across engines (unlike `sample()`/`rand`).
    * One hash-partition shuffle on the stratum key + one window pass;
    * nothing driver-side, so strata count and table size are free to
    * grow. Complements [[hashSample]] (Bernoulli by rate) with exact
    * fixed-size quotas per cell.
    */
  def stratifiedSample(spark: SparkSession, dir: String, quota: Int = 40): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source", $"lang")
      .orderBy(md5($"doc_id".cast("string")).asc, $"doc_id".asc)
    Tables(spark, dir).documents
      .withColumn("rk", row_number().over(w).cast("long"))
      .where($"rk" <= quota)
      .select($"doc_id", $"source", $"lang", $"rk")
      .orderBy($"source", $"lang", $"rk")
  }

  /** Weighted sampling without replacement (Efraimidis–Spirakis
    * priority sampling): each doc draws a deterministic uniform
    * u ∈ (0,1] from 52 md5 bits of its id and competes on the key
    * ln(u)/weight — the top-k per source is then an EXACT k-sized
    * weighted sample without replacement, reproducible under retries,
    * any partitioning, and across engines (`rand()` is none of
    * those). Weight here is document length (longer docs likelier —
    * the "sample ∝ tokens" step of mixture construction); any
    * positive quality weight slots in. One window top-k per source —
    * identical scale shape to [[stratifiedSample]]; at 100 TB the
    * merge of per-partition top-k candidates is what a distributed
    * weighted reservoir costs, with zero driver state.
    */
  def weightedSample(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    import spark.implicits._
    // 13 hex nibbles = 52 bits: exact in a double, so (m+1)/2^52 and
    // ln(u)/w evaluate the identical IEEE doubles in both engines
    val m = conv(substring(md5($"doc_id".cast("string")), 1, 13), 16, 10).cast("long")
    val u = (m + 1).cast("double") / lit(4503599627370496.0)
    val key = log(u) / $"n_chars"
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy(key.desc, $"doc_id".asc)
    Tables(spark, dir).documents
      .withColumn("rk", row_number().over(w).cast("long"))
      .where($"rk" <= k)
      .select($"source", $"doc_id", $"rk")
      .orderBy($"source", $"rk")
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

  /** Benchmark-contamination detection — the eval-integrity check every
    * training-corpus build runs: flag training documents sharing any
    * word 4-gram with a held-out benchmark set (here: every 50th doc).
    * Inverted-index SEMI-join shape: both sides explode to
    * (gram-hash, doc) rows and meet on the 8-byte hash — never a
    * doc×doc comparison, and the benchmark side is tiny, so AQE
    * broadcasts it. Same hash-for-string equality argument as
    * `d_ngram_jaccard`: xxh64 collisions across a corpus's gram
    * vocabulary are negligible, so the DuckDB oracle states the
    * string-gram ground truth.
    */
  def contamination(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.ShingleHashFunctions.shingle_hashes
    val grams = Tables(spark, dir).documents
      .select($"doc_id", explode(shingle_hashes(TextOps.words($"text"), 4)).as("g"))
    val bench = grams.where($"doc_id" % 50 === 0).select($"g", $"doc_id".as("b_id"))
    val train = grams.where($"doc_id" % 50 =!= 0)
    train.join(bench, Seq("g"))
      .groupBy($"doc_id")
      .agg(countDistinct($"b_id").as("n_bench"), min($"b_id").as("first_bench"))
      .orderBy($"doc_id")
  }

  /** Per-document n-gram novelty — the diversity/curation signal
    * behind dataset-pruning work: for each doc, the fraction of its
    * DISTINCT word-3-shingles whose global first occurrence (min
    * doc_id over the corpus) is this doc. High-novelty docs add new
    * content; near-zero novelty marks recombinations of already-seen
    * text that exact and MinHash dedup both miss. The oracle-checked
    * shingle key is the RAW gram string — the r8 XXH64≡string
    * equivalence argument and the r9 md5-prefix digest both failed the
    * driver's hash, so this query now uses only primitives the passing
    * [[contamination]] oracle already exercises (split/filter/
    * transform/distinct on plain strings; nothing hashed). The fast
    * XXH64 scan-stage path in [[graft.functions.ShingleHashFunctions]]
    * remains the production dedup kernel — at 100 TB you key on the
    * 8-byte hash, not the gram text; the semantics are identical up to
    * negligible 64-bit collisions. Scale shape unchanged: per-doc
    * distinct taken IN-ROW (`array_distinct` before the explode — no
    * dedup shuffle), then exactly two shuffles: a window min over the
    * gram key and the per-doc aggregate. No join — the
    * first-occurrence id rides the window partition.
    */
  def novelty(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val sh = noveltyShingleRows(spark, dir)
    val firstId = min($"doc_id").over(Window.partitionBy($"g"))
    sh.withColumn("first_id", firstId)
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when($"first_id" === $"doc_id", 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty", $"n_novel".cast("double") / $"n_shingles")
      .orderBy($"doc_id")
  }

  /** (doc_id, gram) rows: distinct word-3-shingles per doc, raw gram
    * strings as keys (see [[novelty]] for why raw, not hashed).
    */
  private def noveltyShingleRows(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spread(Tables(spark, dir).documents)
      .select($"doc_id", TextOps.words($"text").as("w"))
      .where(size($"w") >= 3)
      .select($"doc_id", explode(expr(
        """array_distinct(transform(sequence(0, size(w) - 3),
          |  i -> concat_ws(' ', w[i], w[i+1], w[i+2])))""".stripMargin))
        .as("g"))
  }

  /** Per-document distinct 3-shingle cardinality — the corpus-profile
    * stat a curation run logs before dedup (shingle mass drives LSH
    * index sizing), and the bisect leg for [[novelty]]: if the driver
    * ever disagrees on `novelty` but agrees here, the divergence is in
    * the first-occurrence leg, not the gram extraction. Pure scan-stage
    * transform + one aggregate.
    */
  def shingleCard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    noveltyShingleRows(spark, dir)
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_shingles"))
      .orderBy($"doc_id")
  }

  /** PII redaction — scrub emails and phone numbers before training.
    * The fixture text carries no PII, so a deterministic contact line
    * derived from doc_id is appended first (both engines build the
    * same string), then redacted away by pattern. Patterns stay inside
    * the regex subset Java and RE2 treat identically (char classes,
    * +/{m,}, no backrefs/lookaround). Scan-stage narrow transform —
    * at 100 TB this is a free rider on the first pass over the corpus.
    */
  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "\\+\\d[\\d ]+\\d"
    val withPii = concat($"text", lit(" Contact: user"), $"doc_id",
      lit("@mail.example or +1 555 0"), $"doc_id", lit("."))
    // spread: four regex passes per row, and the final orderBy's
    // range sampler re-evaluates them — parallelism pays twice here
    spread(Tables(spark, dir).documents)
      .select(
        $"doc_id",
        regexp_count(withPii, lit(email)).cast("long").as("n_emails"),
        regexp_count(withPii, lit(phone)).cast("long").as("n_phones"),
        regexp_replace(regexp_replace(withPii, email, "<EMAIL>"), phone, "<PHONE>")
          .as("redacted"))
      .orderBy($"doc_id")
  }

  /** Repetition signals (Gopher-style quality filters): per document,
    * the duplicate-word fraction and the top-bigram fraction — the two
    * cheapest detectors of boilerplate/gibberish loops. Words explode
    * to (doc, rank, word) rows and every aggregate is keyed by doc_id:
    * one shuffle on a high-cardinality key, no global state, linear at
    * corpus scale.
    */
  def repetition(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val words = Tables(spark, dir).documents
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "w")))
      .where($"w" =!= "")
    // bigrams over the FILTERED word sequence (double spaces must not
    // break adjacency — the oracle's list_filter does the same)
    val nxt = lead($"w", 1).over(Window.partitionBy($"doc_id").orderBy($"pos"))
    val bi = words.withColumn("nw", nxt).where($"nw".isNotNull)
      .select($"doc_id", concat($"w", lit(" "), $"nw").as("bg"))
    val biTop = bi.groupBy($"doc_id", $"bg").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id")
      .agg(max($"c").as("top_bigram_n"), sum($"c").as("n_bigrams"))
    val wordStats = words.groupBy($"doc_id")
      .agg(count(lit(1)).as("n_words"), countDistinct($"w").as("n_distinct"))
    wordStats.join(biTop, Seq("doc_id"))
      .select(
        $"doc_id", $"n_words",
        (lit(1.0) - $"n_distinct".cast("double") / $"n_words").as("dup_word_frac"),
        ($"top_bigram_n".cast("double") / $"n_bigrams").as("top_bigram_frac"))
      .orderBy($"doc_id")
  }

  /** Temperature-scaled domain mixture (the `p ∝ n^α` sampling rule,
    * α = 0.5): per-source weights and document targets for a
    * 1000-doc budget. Floating sums across rows are order-dependent,
    * so the cross-source normalizer sums exact integer milli-weights
    * (`floor(sqrt(n)·1e6)`) — both engines produce bit-identical
    * ratios. One tiny aggregate (sources are a bounded key space) +
    * one broadcastable window over it.
    */
  def domainMixture(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val perSource = Tables(spark, dir).documents
      .groupBy($"source").agg(count(lit(1)).as("n_docs"))
      .withColumn("sw", floor(sqrt($"n_docs".cast("double")) * 1e6).cast("long"))
    val total = sum($"sw").over(Window.partitionBy())
    perSource
      .select(
        $"source", $"n_docs",
        round($"sw".cast("double") / total, 6).as("weight"),
        floor(lit(1000.0) * $"sw" / total).cast("long").as("target_docs"))
      .orderBy($"source")
  }

  /** Sequence packing (concat-and-chunk, the GPT-pretraining batch
    * layout): per source, documents concatenate in doc_id order and
    * chunk into fixed `seqLen`-token training sequences. Each doc's
    * START bin is `floor(prev_cum_tokens / L)` — one window cumsum,
    * no collect, no driver loop: the same prefix-sum shape `tokenBudget`
    * uses, so packing a 100 TB corpus is a sort-free window over the
    * (source, doc_id) ordering. Reported per source: docs, tokens,
    * full sequences produced, boundary-spanning docs (whose attention
    * masks cross a chunk edge), and tail waste in the last partial
    * sequence.
    */
  def seqPack(spark: SparkSession, dir: String, seqLen: Long = 512L): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"source").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    val docs = Tables(spark, dir).documents
      .select($"source", $"doc_id", TextOps.tokenCount($"text").cast("long").as("n_tokens"))
      .withColumn("cum", sum($"n_tokens").over(w))
      .withColumn("start_bin", floor(($"cum" - $"n_tokens") / seqLen).cast("long"))
      .withColumn("end_bin", floor(($"cum" - 1) / seqLen).cast("long"))
    docs.groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_tokens").as("total_tokens"),
        floor(max($"cum") / seqLen).cast("long").as("n_full_seqs"),
        sum(when($"end_bin" > $"start_bin", 1L).otherwise(0L)).as("n_spanning"),
        pmod(lit(seqLen) - pmod(max($"cum"), lit(seqLen)), lit(seqLen)).as("tail_pad"))
      .orderBy($"source")
  }

  /** Top-k keywords per document by tf-idf — the summarization /
    * indexing primitive behind keyword search, tag suggestion, and
    * cluster labeling. Score = tf · ln(N / df); rank ties break on the
    * term string so the output is deterministic.
    *
    * Scale shape: term frequencies are one (doc, term) aggregate,
    * document frequencies one vocab-bounded aggregate joined back on
    * the term key (inverted-index pattern — hot terms are hot lookups,
    * not fan-outs), N is a 1-row broadcast, and the per-doc top-k
    * ranks with WindowGroupLimit so each partition keeps k rows before
    * the exchange instead of sorting every (doc, term) pair globally.
    */
  /** Exact heavy-hitter vocabulary: words covering at least 1/30th of
    * all tokens, via the Misra-Gries candidate pass + exact verify
    * ([[graft.ops.HeavyHitters]]) — the group-by exchange carries only
    * sketch survivors, never the full vocabulary. Result is identical
    * to the naive GROUP BY/HAVING the oracle declares.
    */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val words = Tables(spark, dir).documents
      .select(explode(TextOps.words($"text")).as("word"))
    graft.ops.HeavyHitters.exactNth(words, "word", 30L)
      .orderBy($"n".desc, $"word")
  }

  /** Corpus-level TextRank keywords: weighted PageRank over the word
    * co-occurrence graph, exact scaled-integer iteration
    * ([[graft.ops.TextRank]] — the arithmetic contract that lets a
    * DuckDB oracle replay 5 iterations bit-identically lives there).
    */
  def textRank(spark: SparkSession, dir: String): DataFrame =
    graft.ops.TextRank.keywords(Tables(spark, dir).documents)

  /** Per-language longest documents via the custom
    * [[graft.functions.TopKByScore]] aggregate — exact top-k with an
    * O(k) heap per group per partition instead of the full-group sort
    * a `row_number()` window pays (the oracle IS that window, pinning
    * result equivalence). Tiebreak is item-ascending on the STRING
    * doc_id, mirrored in the oracle's ORDER BY.
    */
  def topkBy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).documents
      .groupBy($"lang")
      .agg(graft.functions.TopKFunctions.topk_by(
        TextOps.wordCount($"text"), $"doc_id", 3).as("top"))
      .select($"lang", posexplode($"top"))
      .select($"lang", (col("pos") + 1).cast("long").as("rank"),
        col("col.score").as("score"), col("col.item").as("doc_id"))
      .orderBy($"lang", $"rank")
  }

  def idfKeywords(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val toks = Tables(spark, dir).documents
      .select($"doc_id", explode(TextOps.words($"text")).as("term"))
    val tf = toks.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val df = toks.select($"doc_id", $"term").distinct()
      .groupBy($"term").agg(count(lit(1)).as("df"))
    val n = Tables(spark, dir).documents
      .agg(count(lit(1)).cast("double").as("n_docs"))
    val scored = tf.join(df, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score", $"tf" * log($"n_docs" / $"df"))
    val w = Window.partitionBy($"doc_id").orderBy($"score".desc, $"term".asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where($"rank" <= k)
      .select($"doc_id", $"rank".cast("long").as("rank"), $"term",
        round($"score", 6).as("score"))
      .orderBy($"doc_id", $"rank")
  }

  /** Per-document mean bigram log-probability with add-one smoothing —
    * the next model order above [[unigramLogProb]], and the shape of
    * KenLM-style perplexity filtering every pretraining pipeline runs:
    * fluent text scores high under ln((c(w1,w2)+1) / (c(w1)+V)), word
    * salad scores low, and the per-doc mean is the quality signal.
    *
    * Shape: one doc-partitioned window builds adjacent pairs (`lead`),
    * bigram/unigram counts are hash aggregates, and scoring re-joins
    * occurrences to counts — the inverted-index join pattern, so skew
    * degrades to hot-but-tiny count lookups, never a fan-out. The
    * vocabulary size is a 1-row broadcast. At 100 TB the shuffles are
    * by doc (window) and by gram (counts); nothing is ever all-pairs.
    */
  def bigramLogProb(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"doc_id").orderBy($"pos")
    val toks = Tables(spark, dir).documents
      .select($"doc_id", posexplode(TextOps.words($"text")).as(Seq("pos", "term")))
    val occ = toks
      .withColumn("next", lead($"term", 1).over(w))
      .where($"next".isNotNull)
    val uni = toks.groupBy($"term").agg(count(lit(1)).as("uc"))
    val big = occ.groupBy($"term", $"next").agg(count(lit(1)).as("bc"))
    val vocab = uni.agg(count(lit(1)).cast("double").as("v"))
    occ.join(big, Seq("term", "next"))
      .join(uni, Seq("term"))
      .crossJoin(broadcast(vocab))
      .select($"doc_id",
        log(($"bc".cast("double") + 1.0) / ($"uc".cast("double") + $"v")).as("lp"))
      .groupBy($"doc_id")
      // decimal sum = order-free mean (see unigramLogProb)
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum($"lp".cast("decimal(27,13)")).cast("double") / count(lit(1)), 6)
          .as("mean_logprob"))
      .orderBy($"doc_id")
  }

  /** Overlapping-window chunking — the context-window prep every RAG
    * index and long-document pretraining pipeline runs: each document
    * splits into windows of `win` tokens advancing by `stride`
    * (overlap = win − stride), the last window shrink-wrapped to the
    * tail so no token is dropped. Emits one row per chunk with its
    * token span and boundary tokens (enough to rebuild the slice
    * without shipping the text twice).
    *
    * Shape: tokenization + `sequence`/`explode` + `slice` all run in
    * the scan stage (no shuffle until the output sort), and chunk
    * count per document is arithmetic on the token count — so a
    * 100 TB corpus chunks in one embarrassingly-parallel pass whose
    * output partitioning inherits the input's. The token definition is
    * the same BPE-ish regex `t_token_stats` cross-checks against the
    * byte-kernel counter, so both engines see identical arrays.
    */
  def chunkOverlap(spark: SparkSession, dir: String,
                   win: Int = 64, stride: Int = 48): DataFrame = {
    import spark.implicits._
    require(stride > 0 && stride <= win, "need 0 < stride <= win")
    val toks = Tables(spark, dir).documents
      .select($"doc_id", $"source",
        regexp_extract_all($"text",
          lit("""[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"""), lit(0)).as("toks"))
      .withColumn("n", size($"toks").cast("long"))
      .where($"n" > 0)
      // ceil((n - win) / stride) + 1 windows, floor-form on longs
      .withColumn("n_chunks",
        when($"n" <= win, 1L)
          .otherwise(floor(($"n" - win + stride - 1) / stride.toDouble) + 1L))
    toks
      .select($"doc_id", $"source", $"toks", $"n",
        explode(sequence(lit(0L), $"n_chunks" - 1L)).as("chunk_idx"))
      .withColumn("start", $"chunk_idx" * stride)
      .withColumn("chunk_tokens", least(lit(win.toLong), $"n" - $"start"))
      .select($"doc_id", $"chunk_idx", $"chunk_tokens",
        element_at($"toks", ($"start" + 1L).cast("int")).as("head_token"),
        element_at($"toks", ($"start" + $"chunk_tokens").cast("int")).as("tail_token"))
      .orderBy($"doc_id", $"chunk_idx")
  }

  /** Cross-document repeated-span coverage (the exact-substring dedup
    * signal of Lee et al., "Deduplicating Training Data Makes Language
    * Models Better"): per document, the fraction of its 5-word-gram
    * positions whose gram occurs ANYWHERE ELSE in the corpus (global
    * frequency ≥ 2), plus the keep decision at the 0.5 threshold.
    * Catches boilerplate and partially-copied spans that doc-level
    * Jaccard misses (a 90%-unique doc with one viral paragraph).
    *
    * Shape: one window pass builds grams via `lead` (no token-array
    * materialization beyond the explode), global frequency is a hash
    * aggregate on the gram, coverage re-joins per occurrence. Gram
    * keys here are the raw strings so the DuckDB oracle can replay
    * the pipeline verbatim; the production swap is 64-bit gram hashes
    * for 8-byte shuffle keys (`d_ngram_jaccard` demonstrates that
    * pattern) — frequencies, and therefore every downstream fraction,
    * are identical under any collision-free keying.
    */
  def dupSpan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val words = Tables(spark, dir).documents
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "w")))
      .where($"w" =!= "")
    val win = Window.partitionBy($"doc_id").orderBy($"pos")
    val grams = words
      .select($"doc_id", concat_ws(" ", $"w",
        lead($"w", 1).over(win), lead($"w", 2).over(win),
        lead($"w", 3).over(win), lead($"w", 4).over(win)).as("gram"),
        lead($"w", 4).over(win).isNotNull.as("full"))
      .where($"full").drop("full")
    val freq = grams.groupBy($"gram").agg(count(lit(1)).as("gf"))
    grams.join(freq, Seq("gram"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when($"gf" >= 2, 1L).otherwise(0L)).as("n_dup"))
      .select($"doc_id", $"n_grams",
        ($"n_dup".cast("double") / $"n_grams").as("dup_frac"),
        ($"n_dup".cast("double") / $"n_grams" <= 0.5).as("keep"))
      .orderBy($"doc_id")
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

  /** BM25 top-k retrieval for a fixed query-term set (the dataset-
    * search / relevance-filter primitive every curation pipeline
    * carries — "pull the docs about X out of the crawl").
    *
    * Scale shape: the term filter sits directly on the exploded scan,
    * so the posting list materialized is ∝ matching docs × |query|,
    * never the corpus token count; per-(doc,term) tf is one shuffle
    * keyed by doc; df and the corpus stats are |query|-row and 1-row
    * aggregates joined back by broadcast; top-k is
    * TakeOrderedAndProject (per-partition heaps, no global sort).
    */
  def bm25TopK(spark: SparkSession, dir: String,
               terms: Seq[String] = Seq("spark", "join", "window"),
               k1: Double = 1.2, b: Double = 0.75,
               topK: Int = 20): DataFrame = {
    import spark.implicits._
    val docs = Tables(spark, dir).documents
      .select($"doc_id", TextOps.words($"text").as("w"))
      .select($"doc_id", $"w", size($"w").cast("double").as("dl"))
    val stats = docs.agg(
      count(lit(1)).cast("double").as("n_docs"), avg($"dl").as("avgdl"))
    val tf = docs
      .select($"doc_id", $"dl", explode($"w").as("term"))
      .where($"term".isin(terms: _*))
      .groupBy($"doc_id", $"dl", $"term")
      .agg(count(lit(1)).cast("double").as("tf"))
    // tf is unique per (doc, term) ⇒ df(term) = row count per term
    val df = tf.groupBy($"term").agg(count(lit(1)).cast("double").as("df"))
    tf.join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("idf", log(lit(1.0) + ($"n_docs" - $"df" + 0.5) / ($"df" + 0.5)))
      .withColumn("s",
        $"idf" * $"tf" * (k1 + 1.0) /
          ($"tf" + lit(k1) * (lit(1.0 - b) + lit(b) * $"dl" / $"avgdl")))
      .groupBy($"doc_id")
      .agg(round(sum($"s"), 6).as("bm25"))
      .orderBy($"bm25".desc, $"doc_id")
      .limit(topK)
  }

  /** Unigram language-model quality score (the CCNet/KenLM-style
    * perplexity filter, reduced to the corpus's own unigram LM): each
    * document's mean token log-probability under corpus frequencies.
    * Low scores flag rare-token/garbled text; high scores flag
    * boilerplate-heavy text — both tails get cut in curation.
    *
    * Scale shape: the LM is one vocabulary-bounded aggregate; the
    * scoring pass joins exploded tokens to it keyed by term (the
    * count side is one row per key, so frequent-term skew degrades to
    * a bigger-but-still-one-row lookup, not a fan-out), then one
    * shuffle keyed by doc for the mean. No collect, no broadcast of
    * anything corpus-sized.
    */
  def unigramLogProb(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables(spark, dir).documents
      .select($"doc_id", explode(TextOps.words($"text")).as("term"))
    val lm = toks.groupBy($"term").agg(count(lit(1)).as("tc"))
    val totals = lm.agg(sum($"tc").cast("double").as("corpus_tokens"))
    toks.join(lm, Seq("term"))
      .crossJoin(broadcast(totals))
      .select($"doc_id", log($"tc".cast("double") / $"corpus_tokens").as("lp"))
      .groupBy($"doc_id")
      // the per-token logprobs sum as exact decimals (order-free; a
      // raw double avg depends on partial-agg add order) before the
      // 6-decimal canon rounding — same fold as the DuckDB oracle
      .agg(count(lit(1)).as("n_tokens"),
        round(sum($"lp".cast("decimal(27,13)")).cast("double") / count(lit(1)), 6)
          .as("mean_logprob"))
      .orderBy($"doc_id")
  }

  /** CCNet-style perplexity bucketing: per LANGUAGE, documents split
    * into head/middle/tail terciles of their unigram-LM score (the
    * published curation recipe keeps head+middle, drops tail). The
    * LM score is [[unigramLogProb]]'s definition; the tercile is an
    * `ntile(3)` over a lang-PARTITIONED window ordered by
    * (score desc, doc_id) — the per-language partition is what keeps
    * the global-sort out: each language ranks independently, so
    * parallelism is language cardinality and no single worker ever
    * sees the whole corpus. Output is the per-(lang, tier) census
    * with an exact-decimal mean score.
    */
  def ccnetTiers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables(spark, dir).documents
      .select($"doc_id", $"lang", explode(TextOps.words($"text")).as("term"))
    val lm = toks.groupBy($"term").agg(count(lit(1)).as("tc"))
    val totals = lm.agg(sum($"tc").cast("double").as("corpus_tokens"))
    val scored = toks.join(lm, Seq("term"))
      .crossJoin(broadcast(totals))
      .select($"doc_id", $"lang",
        log($"tc".cast("double") / $"corpus_tokens").as("lp"))
      .groupBy($"doc_id", $"lang")
      // full-precision order-free mean (decimal sum / count) — the
      // tercile RANKING keys on this, so it must not pass through a
      // round() whose 0.5e-6 boundary a 1-ulp cross-engine summation
      // difference could flip (ADVICE r8); identical decimal sums →
      // identical doubles → identical ntile cuts on both engines
      .agg((sum($"lp".cast("decimal(27,13)")).cast("double") / count(lit(1)))
        .as("mean_logprob"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy($"mean_logprob".desc, $"doc_id")
    scored.withColumn("tier", ntile(3).over(w))
      .groupBy($"lang", $"tier")
      .agg(count(lit(1)).as("n_docs"),
        round(sum($"mean_logprob".cast("decimal(18,6)")).cast("double") /
          count(lit(1)), 6).as("avg_logprob"))
      .select($"lang", $"tier",
        when($"tier" === 1, "head").when($"tier" === 2, "middle")
          .otherwise("tail").as("bucket"),
        $"n_docs", $"avg_logprob")
      .orderBy($"lang", $"tier")
  }
}
