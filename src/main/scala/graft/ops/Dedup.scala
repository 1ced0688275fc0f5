package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.HashFunctions._

/** Deduplication operators for LLM training-data pipelines, from exact
  * to fuzzy (north star; the reference's only dedup is
  * `dropDuplicates()`, dags/etl.py:68 — SURVEY.md §2.4 A3).
  *
  * Scale design: nothing here compares all pairs. Exact dedup is one
  * hash aggregate; near-dup goes through candidate generation (inverted
  * index or LSH banding) so the join fan-out is proportional to true
  * collisions, then an exact verify pass removes false positives.
  * Outputs are deterministic (no sampling, fixed seeds).
  */
object Dedup {

  /** Exact duplicate groups by normalized-text fingerprint: one
    * hash-groupBy, the linear-scale baseline every pipeline runs first.
    */
  def exactGroups(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol), TextOps.fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keep_id"))

  /** Exact n-gram Jaccard similarity join via shingle inverted index.
    *
    * Explode distinct shingles → self-join on shingle (pairs that share
    * at least one shingle — a superset of any pair with jaccard > 0) →
    * count shared shingles per pair → jaccard from set sizes. Exact
    * (no approximation), and the shuffle key is the shingle, so skew is
    * bounded by shingle document frequency, not corpus size.
    */
  def ngramJaccardPairs(docs: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id", n: Int = 3,
                        threshold: Double = 0.5): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
        TextOps.wordShingles(col(textCol), n).as("shingles"))
      .withColumn("sz", size(col("shingles")))
    val inv = sh.select(col("id"), col("sz"), explode(col("shingles")).as("shingle"))
    val a = inv.select(col("shingle"), col("id").as("a_id"), col("sz").as("a_sz"))
    val b = inv.select(col("shingle"), col("id").as("b_id"), col("sz").as("b_sz"))
    a.join(b, Seq("shingle"))
      .where(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"), col("a_sz"), col("b_sz"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("a_sz") + col("b_sz") - col("inter")))
      .where(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** MinHash + LSH banding near-dup candidates, exact-verified.
    *
    * signature(k hashes) → `bands` bands of k/bands rows → band-hash
    * join buckets candidates (collision prob 1-(1-s^r)^b) → candidates
    * are re-checked with exact shingle Jaccard so the output contains
    * no false positives. With k=128, bands=32 (r=4), a pair at
    * jaccard 0.9 is missed with prob (1-0.9^4)^32 ≈ 1e-15.
    *
    * This is the 100 TB path: cost is O(corpus × k) hashing + a
    * bucket-join whose fan-out tracks true near-dup density, never
    * O(n²).
    */
  def minHashLshPairs(docs: DataFrame, textCol: String = "text",
                      idCol: String = "doc_id", n: Int = 3,
                      numHashes: Int = 128, bands: Int = 32,
                      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val sh = docs.select(col(idCol).as("id"),
        TextOps.wordShingles(col(textCol), n).as("shingles"))
      .withColumn("sz", size(col("shingles")))
      .where(col("sz") > 0)
    val sig = sh.withColumn("sig", minhash_sig(col("shingles"), numHashes))
    val banded = sig.select(col("id"), col("sig"),
        explode(transform(sequence(lit(0), lit(bands - 1)), b =>
          struct(b.as("band"), xxhash64(b, slice(col("sig"), b * r + 1, lit(r))).as("bh"))))
          .as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
    val cand = banded.as("x").join(banded.as("y"), Seq("band", "bh"))
      .where(col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"))
      .distinct()
    // exact verify: recompute jaccard on the candidate pairs only
    val sets = sh.select(col("id"), col("shingles"), col("sz"))
    cand
      .join(sets.select(col("id").as("a_id"), col("shingles").as("a_sh"), col("sz").as("a_sz")), Seq("a_id"))
      .join(sets.select(col("id").as("b_id"), col("shingles").as("b_sh"), col("sz").as("b_sz")), Seq("b_id"))
      .withColumn("inter", size(array_intersect(col("a_sh"), col("b_sh"))))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("a_sz") + col("b_sz") - col("inter")))
      .where(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** SimHash near-dup pairs: 64-bit fingerprints, banded into 4×16-bit
    * chunks (a pair within Hamming distance 3 must agree on at least
    * one chunk — pigeonhole), verified by exact popcount.
    */
  def simHashPairs(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id", maxHamming: Int = 3): DataFrame = {
    // pigeonhole completeness requires one more chunk than the allowed
    // distance: d differing bits cannot touch all d+1 chunks
    require(maxHamming >= 0 && maxHamming <= 15, s"bad maxHamming $maxHamming")
    val chunks = maxHamming + 1
    val width = (64 + chunks - 1) / chunks
    val mask = if (width >= 64) -1L else (1L << width) - 1
    val fp = docs.select(col(idCol).as("id"),
        simhash64(TextOps.words(col(textCol))).as("sh"))
    val banded = fp.select(col("id"), col("sh"),
        explode(array((0 until chunks).map(c =>
          struct(lit(c).as("chunk"),
            shiftrightunsigned(col("sh"), c * width).bitwiseAND(lit(mask)).as("ch"))): _*))
          .as("cc"))
      .select(col("id"), col("sh"), col("cc.chunk").as("chunk"), col("cc.ch").as("ch"))
    banded.as("x").join(banded.as("y"), Seq("chunk", "ch"))
      .where(col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"),
        bit_count(col("x.sh").bitwiseXOR(col("y.sh"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Embedding near-dup: cosine ≥ threshold via hyperplane-LSH
    * candidate buckets, exact-verified — see
    * [[Similarity.cosineDupPairs]].
    */

  /** Near-dup clusters from a pair list: connected components over the
    * similarity graph (GraphX), labeling every involved doc with its
    * component's minimum doc id — the canonical "keep one per cluster"
    * step that turns pair mining into an actual dedup. Pregel-based,
    * converges in O(component diameter) supersteps; at 100 TB the
    * pair list is tiny relative to the corpus (it tracks true near-dup
    * density), so the graph step is cheap.
    */
  def nearDupClusters(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val edges = pairs.select(col("a_id").cast("long"), col("b_id").cast("long"))
      .as[(Long, Long)].rdd
      .map { case (a, b) => org.apache.spark.graphx.Edge(a, b, ()) }
    val graph = org.apache.spark.graphx.Graph.fromEdges(edges, ())
    val cc = org.apache.spark.graphx.lib.ConnectedComponents.run(graph)
    cc.vertices.toDF("doc_id", "cluster_root")
  }

  /** Apply dedup: keep one canonical doc (min id) per near-dup cluster,
    * plus every doc not involved in any pair.
    */
  def dedupByClusters(docs: DataFrame, pairs: DataFrame,
                      idCol: String = "doc_id"): DataFrame = {
    val clusters = nearDupClusters(pairs)
    val drop = clusters.where(col("doc_id") =!= col("cluster_root"))
      .select(col("doc_id").as(idCol))
    docs.join(drop, Seq(idCol), "left_anti")
  }
}
