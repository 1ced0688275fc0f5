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

  /** One row per (vector, LSH table): id, vec, table, bucket — the
    * shared candidate-generation step for ANN and near-dup pairing.
    */
  private def bucketed(df: DataFrame, idCol: String, vecCol: String,
                       id: String, vec: String,
                       dim: Int, tables: Int, bits: Int, seedBase: Long): DataFrame =
    df.select(col(idCol).as(id), col(vecCol).as(vec),
        explode(array((0 until tables).map(t =>
          struct(lit(t).as("table"),
            hyperplane_bucket(col(vecCol), dim, bits, seed = seedBase * (t + 1)).as("bucket"))): _*))
          .as("tb"))
      .select(col(id), col(vec), col("tb.table").as("table"), col("tb.bucket").as("bucket"))

  /** Approximate top-k via multi-table hyperplane LSH. A candidate is
    * scored iff it shares a bucket with the probe in at least one
    * table; ranking among candidates is exact cosine.
    */
  def annTopK(corpus: DataFrame, probes: DataFrame, k: Int,
              dim: Int, tables: Int = 8, bits: Int = 12,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val p = bucketed(probes, idCol, vecCol, "probe_id", "probe_vec", dim, tables, bits, 7919L)
    val c = bucketed(corpus, idCol, vecCol, "neighbor_id", "vec", dim, tables, bits, 7919L)
    val cand = p.join(c, Seq("table", "bucket"))
      .where(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("probe_vec"), col("neighbor_id"), col("vec"))
      .dropDuplicates("probe_id", "neighbor_id")
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    cand
      .withColumn("sim", cosine_sim(col("probe_vec"), col("vec")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("neighbor_id"), col("sim"))
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold, LSH-bucketed
    * candidates, exact verify. The embedding-space analog of
    * [[Dedup.minHashLshPairs]].
    */
  def cosineDupPairs(corpus: DataFrame, threshold: Double, dim: Int,
                     tables: Int = 8, bits: Int = 10,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val b = bucketed(corpus, idCol, vecCol, "id", "vec", dim, tables, bits, 104729L)
    b.as("x").join(b.as("y"), Seq("table", "bucket"))
      .where(col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"),
        col("x.vec").as("a_vec"), col("y.vec").as("b_vec"))
      .dropDuplicates("a_id", "b_id")
      .withColumn("sim", cosine_sim(col("a_vec"), col("b_vec")))
      .where(col("sim") >= threshold)
      .select(col("a_id"), col("b_id"), col("sim"))
  }
}
