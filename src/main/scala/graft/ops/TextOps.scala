package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines (north
  * star; the reference computes no text functions of its own —
  * SURVEY.md §2.8). All are built from codegen'd
  * `org.apache.spark.sql.functions` so they run inside whole-stage
  * codegen in the scan stage: zero shuffles, linear scale-out.
  *
  * Every definition here is deliberately expressible in ANSI SQL too —
  * the DuckDB oracles in [[graft.SparkEntry.oracleSql]] re-state the
  * same arithmetic, so correctness is hash-checked cross-engine.
  */
object TextOps {

  /** Whitespace word tokens (non-empty). */
  def words(text: Column): Column =
    filter(split(text, " "), w => w =!= "")

  /** Word w-shingles (n-grams joined by spaces) — the dedup unit for
    * MinHash/Jaccard. Distinct (set semantics), empty for docs shorter
    * than n words. Single-pass custom expression: the `transform`/
    * `element_at` formulation re-evaluates the tokenizer per element
    * (see [[graft.functions.WordShingles]]).
    */
  def wordShingles(text: Column, n: Int): Column =
    graft.functions.ShingleFunctions.word_shingles(words(text), n)

  /** BPE-ish token count: alpha runs, digit runs, and single
    * non-alnum-non-space marks — a deterministic proxy for subword
    * tokenizer counts (the real BPE merge table is a model artifact,
    * not an engine feature). Single-pass byte kernel — the
    * `size(regexp_extract_all(...))` formulation materializes the full
    * token array per row only to count it ([[graft.functions.TextScan]]).
    */
  def tokenCount(text: Column): Column =
    graft.functions.TextScanFunctions.token_count(text)

  /** Non-empty whitespace-word count (single-pass, no array). */
  def wordCount(text: Column): Column =
    graft.functions.TextScanFunctions.word_count(text)

  /** Heuristic language ID from stopword hits (n-gram-free variant:
    * the fixture vocabulary is space-separated). CJK codepoints short-
    * circuit to zh. Deterministic, SQL-expressible: `contains` ≡
    * `LIKE '%…%'` for literal needles but runs as a memcmp scan
    * instead of a compiled-regex match.
    */
  def langId(text: Column): Column = {
    def has(w: String): Column = text.contains(s" $w ")
    when(graft.functions.TextScanFunctions.has_cjk(text), "zh")
      .when(has("der") || has("und") || has("nicht"), "de")
      .when(has("le") || has("la") || has("et"), "fr")
      .when(has("el") || has("que") || has("los"), "es")
      .when(has("the") || has("and") || has("of"), "en")
      .otherwise("und")
  }

  /** Punctuation character count (single-pass byte kernel). */
  def punctCount(text: Column): Column =
    graft.functions.TextScanFunctions.punct_count(text)

  /** Stopword ratio over whitespace tokens (two single-pass kernels;
    * whole-stage codegen CSE shares the word count).
    */
  def stopwordRatio(text: Column): Column = {
    val w = wordCount(text)
    when(w > 0,
      graft.functions.TextScanFunctions.stop_count(text).cast("double") / w)
      .otherwise(lit(0.0))
  }

  /** Quality bucket from integer-arithmetic signals (length, token
    * count, punctuation density, stopword ratio) — the classic
    * Gopher/C4-style rule filter shape.
    */
  def qualityBucket(nTokens: Column, nChars: Column, punct: Column, stopRatio: Column): Column =
    when(nTokens < 5, "too_short")
      .when(nChars > 20000, "too_long")
      .when(punct * 5 > nChars, "too_punct")
      .when(stopRatio > 0.6, "boilerplate")
      .otherwise("good")

  /** Document fingerprint: md5 of whitespace-normalized, lowercased
    * text — byte-identical across engines, the exact-dedup key.
    */
  def fingerprint(text: Column): Column =
    md5(trim(lower(regexp_replace(text, "\\s+", " "))))

  /** Rolling-hash winnowing fingerprints (Rabin-Karp k-grams + window
    * minima): the substring-overlap fingerprint family — any shared
    * run of ≥ w+k−1 chars produces a shared fingerprint. See
    * [[graft.functions.WinnowFingerprints]].
    */
  def winnowFingerprints(text: Column, k: Int = 8, w: Int = 4): Column =
    graft.functions.WinnowFunctions.winnow_fingerprints(text, k, w)
}
