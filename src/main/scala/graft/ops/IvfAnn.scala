package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.VectorFunctions._

/** IVF (inverted-file) approximate nearest neighbor — the second scale
  * path next to [[Similarity.annTopK]]'s LSH (north star: "an IVF or
  * LSH-bucketed variant").
  *
  * Index: `nlist` centroids chosen as a deterministic pseudo-random
  * sample of the corpus (stable xxhash64 order — a kmeans refinement
  * would reuse the same assignment path below). The centroid table is
  * index state, bounded by the `nlist` parameter (never by data size),
  * so it is collected once and shipped inside the assignment
  * expression: every corpus vector gets its max-cosine cell in the
  * scan stage — no join, no shuffle, no array-keyed groupBy
  * (FAISS-style coarse quantizer).
  *
  * Search: each probe scores the centroid table (tiny), keeps its top
  * `nprobe` cells, and only vectors in those cells are scored exactly.
  * Cost per probe ≈ nprobe/nlist of the corpus — the classic IVF
  * recall/cost dial.
  */
object IvfAnn {

  /** Deterministic centroid sample, collected to index state:
    * (centroid_id, vector) ordered by stable hash. `collect` here is
    * bounded by `nlist` — an index parameter — not by the corpus.
    */
  def centroidArray(corpus: DataFrame, nlist: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding"): Seq[Array[Float]] =
    corpus.select(col(idCol), col(vecCol).cast("array<float>").as("_v"))
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(nlist)
      .collect()
      .map(_.getSeq[Float](1).toArray)
      .toSeq

  /** Centroid sample as a (small) DataFrame of (centroid_id,
    * centroid_vec) — the broadcast side of probe-cell selection.
    */
  def centroids(corpus: DataFrame, nlist: Int,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    centroidsDf(corpus.sparkSession, centroidArray(corpus, nlist, idCol, vecCol))

  private[ops] def centroidsDf(spark: org.apache.spark.sql.SparkSession,
                               cents: Seq[Array[Float]]): DataFrame = {
    val schema = StructType(Seq(
      StructField("centroid_id", IntegerType, nullable = false),
      StructField("centroid_vec", ArrayType(FloatType, containsNull = false), nullable = false)))
    val rows = cents.zipWithIndex.map { case (v, i) => Row(i, v.toSeq) }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Assign every vector to its max-cosine centroid — one narrow
    * projection, runs embedded in the scan.
    */
  def assign(corpus: DataFrame, cents: DataFrame,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val centArr = cents.orderBy(col("centroid_id"))
      .select(col("centroid_vec").cast("array<float>"))
      .collect().map(_.getSeq[Float](0).toArray).toSeq
    corpus.select(col(idCol), col(vecCol))
      .withColumn("centroid_id", centroid_argmax(col(vecCol), centArr))
  }

  /** Lloyd's k-means refinement of the sampled centroids (spherical
    * flavor: mean of assigned vectors, cosine assignment). Each
    * iteration is ONE distributed pass: scan-stage `centroid_argmax`
    * assignment → posexplode to (cell, dim, value) → mean per (cell,
    * dim) — a hash aggregate whose cardinality is nlist × dim,
    * independent of corpus size — then the new (tiny) centroid table
    * collects back to index state. Cells that lose all members keep
    * their previous centroid. Deterministic; converges the usual
    * k-means way and strictly reuses the search-time assignment path,
    * so refined indexes need no new code to query.
    */
  def refineCentroids(corpus: DataFrame, init: Seq[Array[Float]], iters: Int,
                      vecCol: String = "embedding"): Seq[Array[Float]] = {
    var cents = init
    val vecs = corpus.select(col(vecCol).cast("array<float>").as("_v"))
    // per-dimension avg COLUMNS over the assignment groupBy: one
    // hash aggregate whose partial rows are nlist × dim doubles —
    // the prior posexplode shape shuffled corpus × dim rows through
    // TWO aggregations plus a per-cell sort_array (measured 1.04 s of
    // e_semdedup_kmeans's two iterations; this form is one exchange).
    // Same multiset of doubles through the same avg — the centroid
    // table is equivalent, and cell assignment of identical vectors
    // stays a pure function of the vector either way.
    val dim = init.headOption.map(_.length).getOrElse(0)
    for (_ <- 0 until iters) {
      val avgs = (0 until dim).map(d => avg(col("_v")(d)).as(s"m$d"))
      val means = vecs
        .select(centroid_argmax(col("_v"), cents).as("cell"), col("_v"))
        .groupBy(col("cell"))
        .agg(avgs.head, avgs.tail: _*)
        .collect()
        .map(r => r.getInt(0) ->
          Array.tabulate(dim)(d => r.getDouble(1 + d).toFloat))
        .toMap
      cents = cents.zipWithIndex.map { case (old, i) => means.getOrElse(i, old) }
    }
    cents
  }

  /** IVF top-k: probes search only their `nprobe` best cells.
    * `refineIters` > 0 runs that many Lloyd iterations on the sampled
    * centroids first (better-balanced cells → better recall at the
    * same nprobe).
    */
  def annTopK(corpus: DataFrame, probes: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding",
              refineIters: Int = 0): DataFrame = {
    val sampled = centroidArray(corpus, nlist, idCol, vecCol)
    val centArr =
      if (refineIters > 0) refineCentroids(corpus, sampled, refineIters, vecCol)
      else sampled
    val cents = centroidsDf(corpus.sparkSession, centArr)
    val assigned = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("vec"))
      .withColumn("centroid_id", centroid_argmax(col("vec"), centArr))

    // probes × centroid table is probes × nlist rows — broadcast, then
    // cosine_sim scores agree bit-for-bit with centroid_argmax's
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
