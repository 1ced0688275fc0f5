package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** IVF (inverted-file) approximate nearest neighbor — the second scale
  * path next to [[Similarity.annTopK]]'s LSH (north star: "an IVF or
  * LSH-bucketed variant").
  *
  * Index: `nlist` centroids chosen as a deterministic pseudo-random
  * sample of the corpus (stable xxhash64 order — a kmeans refinement
  * would reuse the same assignment plan below); every corpus vector is
  * assigned to its max-cosine centroid (`max_by` aggregate — one
  * broadcast of the centroid table, no shuffle of the corpus beyond
  * the assignment groupBy).
  *
  * Search: each probe scores the centroid table (tiny), keeps its top
  * `nprobe` cells, and only vectors in those cells are scored exactly.
  * Cost per probe ≈ nprobe/nlist of the corpus — the classic IVF
  * recall/cost dial.
  */
object IvfAnn {

  /** Deterministic centroid sample as a (small) DataFrame of
    * (centroid_id, centroid_vec).
    */
  def centroids(corpus: DataFrame, nlist: Int,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // orderBy+limit plans as a distributed TakeOrderedAndProject (per-
    // partition heaps); the row_number window then runs over only the
    // nlist sampled rows. A global unpartitioned window over the corpus
    // would funnel every vector through one task.
    val sampled = corpus.select(col(idCol), col(vecCol))
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(nlist)
    val w = Window.orderBy(xxhash64(col(idCol)), col(idCol))
    sampled
      .withColumn("_rk", row_number().over(w))
      .select((col("_rk") - 1).as("centroid_id"), col(vecCol).as("centroid_vec"))
  }

  /** Assign every vector to its max-cosine centroid. */
  def assign(corpus: DataFrame, cents: DataFrame,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    corpus.select(col(idCol), col(vecCol))
      .join(broadcast(cents))
      .withColumn("_sim", cosine_sim(col(vecCol), col("centroid_vec")))
      .groupBy(col(idCol), col(vecCol))
      .agg(max_by(col("centroid_id"), struct(col("_sim"), col("centroid_id"))).as("centroid_id"))

  /** IVF top-k: probes search only their `nprobe` best cells. */
  def annTopK(corpus: DataFrame, probes: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = centroids(corpus, nlist, idCol, vecCol)
    val assigned = assign(corpus, cents, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("vec"), col("centroid_id"))

    val probeCells = probes.select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec"))
      .join(broadcast(cents))
      .withColumn("_sim", cosine_sim(col("probe_vec"), col("centroid_vec")))
      .withColumn("_rk", row_number().over(
        Window.partitionBy(col("probe_id")).orderBy(col("_sim").desc, col("centroid_id"))))
      .where(col("_rk") <= nprobe)
      .select(col("probe_id"), col("probe_vec"), col("centroid_id"))

    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    probeCells.join(assigned, Seq("centroid_id"))
      .where(col("probe_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine_sim(col("probe_vec"), col("vec")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("neighbor_id"), col("sim"))
  }
}
