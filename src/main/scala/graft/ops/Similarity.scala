package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.HashFunctions._
import graft.functions.VectorFunctions._

/** Similarity search over an embedding column (`array<float>`) —
  * north-star operator set (BASELINE.json); no reference counterpart.
  *
  * Two tiers:
  *   - [[bruteTopK]]: exact baseline — broadcast the (small) probe set
  *     against the full corpus; one scan, no shuffle of the corpus,
  *     per-probe top-k via window. Exact answers; cost O(probes × corpus).
  *   - [[annTopK]]: the scale path — multi-table random-hyperplane LSH
  *     buckets both sides; only bucket-colliding pairs are scored.
  *     Recall tunes with tables × bits; cost tracks collision counts.
  *
  * Scoring uses the codegen'd [[graft.functions.CosineSim]] expression.
  */
object Similarity {

  /** Exact top-k neighbors for each probe vector (brute force).
    * Probes are broadcast — the corpus never shuffles.
    */
  def bruteTopK(corpus: DataFrame, probes: DataFrame, k: Int,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("vec"))
    val scored = c.join(broadcast(p), col("probe_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine_sim(col("probe_vec"), col("vec")))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("neighbor_id"), col("sim"))
  }

  /** One row per (vector, LSH table): id, table, bucket — the shared
    * candidate-generation step for ANN and near-dup pairing. Ids only:
    * candidate generation shuffles `tables` rows of (id, 2×long) per
    * vector, never the vector itself — the embedding is re-joined by id
    * exactly once for the surviving candidates (at 100 TB the bucket
    * shuffle is `tables` × 24 bytes/row instead of `tables` × the
    * embedding width).
    */
  private def bucketed(df: DataFrame, idCol: String, vecCol: String, id: String,
                       dim: Int, tables: Int, bits: Int, seedBase: Long): DataFrame =
    df.select(col(idCol).as(id),
        explode(array((0 until tables).map(t =>
          struct(lit(t).as("table"),
            hyperplane_bucket(col(vecCol), dim, bits, seed = seedBase * (t + 1)).as("bucket"))): _*))
          .as("tb"))
      .select(col(id), col("tb.table").as("table"), col("tb.bucket").as("bucket"))

  /** Approximate top-k via multi-table hyperplane LSH. A candidate is
    * scored iff it shares a bucket with the probe in at least one
    * table; ranking among candidates is exact cosine.
    *
    * `broadcastProbes = true` (the interactive-search shape: a small
    * query set against a huge corpus) pins both probe joins to
    * broadcast so the corpus bucket rows never shuffle. The default is
    * `false` — the joins plan as shuffles and AQE broadcasts a side
    * that turns out small at runtime — because a forced broadcast of a
    * corpus-scale probe set would hit the 8 GB broadcast limit or OOM
    * the driver; opt in only when the probe set is known-small.
    */
  def annTopK(corpus: DataFrame, probes: DataFrame, k: Int,
              dim: Int, tables: Int = 8, bits: Int = 12,
              idCol: String = "vec_id", vecCol: String = "embedding",
              broadcastProbes: Boolean = false): DataFrame = {
    def maybeBcast(df: DataFrame): DataFrame = if (broadcastProbes) broadcast(df) else df
    val p = bucketed(probes, idCol, vecCol, "probe_id", dim, tables, bits, 7919L)
    val c = bucketed(corpus, idCol, vecCol, "neighbor_id", dim, tables, bits, 7919L)
    val cand = c.join(maybeBcast(p), Seq("table", "bucket"))
      .where(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"))
      .distinct()
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    cand
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("vec")), Seq("neighbor_id"))
      .join(maybeBcast(probes.select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec"))),
        Seq("probe_id"))
      .withColumn("sim", cosine_sim(col("probe_vec"), col("vec")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("neighbor_id"), col("sim"))
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold, LSH-bucketed
    * candidates, exact verify. The embedding-space analog of
    * [[Dedup.minHashLshPairs]]: id-only bucket collection → in-bucket
    * pair expansion → per-side vector fetch by id → exact cosine.
    */
  def cosineDupPairs(corpus: DataFrame, threshold: Double, dim: Int,
                     tables: Int = 8, bits: Int = 10,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val b = bucketed(corpus, idCol, vecCol, "id", dim, tables, bits, 104729L)
    val vecs = corpus.select(col(idCol), col(vecCol))
    Dedup.bucketPairs(b, Seq("table", "bucket"), struct(col("id")))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .distinct()
      .join(vecs.select(col(idCol).as("a_id"), col(vecCol).as("a_vec")), Seq("a_id"))
      .join(vecs.select(col(idCol).as("b_id"), col(vecCol).as("b_vec")), Seq("b_id"))
      .withColumn("sim", cosine_sim(col("a_vec"), col("b_vec")))
      .where(col("sim") >= threshold)
      .select(col("a_id"), col("b_id"), col("sim"))
  }

  /** SemDeDup-shaped near-dup pairs: k-means-partitioned exact cosine
    * (Abbas et al. 2023, "SemDeDup" — cluster the corpus, then compare
    * pairs only WITHIN a cluster). The third pruning strategy next to
    * [[cosineDupPairs]]'s LSH banding and [[IvfAnn]]'s probe-side cell
    * selection: centroids are a deterministic sample refined by
    * spherical Lloyd's ([[IvfAnn.refineCentroids]] — one distributed
    * pass per iteration, nlist×dim-bounded state), assignment runs in
    * the scan stage (`centroid_argmax`, no join), and the only shuffle
    * is the self-join's hash partition on the cell id. Per-cell cost is
    * quadratic in CELL size, never corpus size: at 100 TB you grow
    * `nlist` with the corpus (the paper runs k ≈ n/10⁴) so cells stay
    * O(1) and total work stays O(n · cellSize) — while driver state
    * stays the nlist×dim centroid table. Near-dups that straddle a cell
    * boundary are missed by construction; that is SemDeDup's published
    * recall trade, not an implementation shortcut (identical vectors
    * always share a cell — argmax is a pure function of the vector).
    */
  def semDeDupPairs(corpus: DataFrame, threshold: Double, nlist: Int,
                    refineIters: Int = 2,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val sampled = IvfAnn.centroidArray(corpus, nlist, idCol, vecCol)
    val cents =
      if (refineIters > 0) IvfAnn.refineCentroids(corpus, sampled, refineIters, vecCol)
      else sampled
    val assigned = corpus
      .select(col(idCol).as("id"), col(vecCol).cast("array<float>").as("vec"))
      .withColumn("cell", centroid_argmax(col("vec"), cents))
    val a = assigned.select(col("cell"), col("id").as("a_id"), col("vec").as("a_vec"))
    val b = assigned.select(col("cell"), col("id").as("b_id"), col("vec").as("b_vec"))
    a.join(b, Seq("cell"))
      .where(col("a_id") < col("b_id"))
      .withColumn("sim", cosine_sim(col("a_vec"), col("b_vec")))
      .where(col("sim") >= threshold)
      .select(col("a_id"), col("b_id"), col("sim"))
  }
}
