package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.PqFunctions._
import graft.functions.VectorFunctions._

/** Product-quantization ANN (Jégou et al. 2011; FAISS's `PQx` family) —
  * the third index family next to hyperplane LSH ([[Similarity.annTopK]])
  * and IVF ([[IvfAnn]]), covering the axis the other two don't:
  * COMPRESSION. LSH and IVF both prune which vectors get scored; PQ
  * shrinks what a candidate costs — `m` code ints instead of the
  * `4·dim`-byte vector, scored in O(m) against a per-probe lookup
  * table. At 100 TB of embeddings the search fans over the code table
  * (a ~32× squeeze at dim=64, m=8), and full vectors are touched only
  * to re-rank each probe's short candidate list.
  *
  * Training follows FAISS practice: codebooks are k-means per subspace
  * over a deterministic hash-ordered SAMPLE, trained driver-side —
  * index state bounded by (sample, m, ksub), never by corpus size.
  * Cosine semantics come from normalizing vectors before encode/LUT
  * (cosine = dot of unit vectors); ADC then approximates the dot
  * against the reconstructed unit vector. Exactness is restored by the
  * re-rank: ADC only chooses the `refine·k` candidates whose true
  * vectors get the exact [[graft.functions.CosineSim]] score.
  */
object PqAnn {

  /** Deterministic sample-trained codebooks: `m` subspaces × `ksub`
    * L2 centroids each, Lloyd-refined `iters` times over the sample.
    * The collect is bounded by `sampleN` — an index parameter.
    */
  def trainCodebooks(corpus: DataFrame, m: Int, ksub: Int,
                     sampleN: Int = 1024, iters: Int = 5,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): Seq[Seq[Seq[Float]]] = {
    // collect RAW vectors and normalize the sampleN winners on the
    // driver: the sort key (xxhash64 of the id) never depends on the
    // normalized value, so evaluating the interpreted normalize
    // expression for EVERY corpus row before the TakeOrdered was pure
    // waste (measured 1.07 s of e_cosine_pq_topk's 4.3 s). The driver
    // loop replays the exact Catalyst arithmetic — double-accumulated
    // sum of squares in element order, sqrt, per-element double divide
    // cast back to float — so the trained codebooks are bit-identical.
    val sample = corpus
      .select(col(idCol), col(vecCol).cast("array<float>").as("_v"))
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(sampleN)
      .collect()
      .map { r =>
        val v = r.getSeq[Float](1).toArray
        var acc = 0.0; var i = 0
        while (i < v.length) { acc += v(i).toDouble * v(i).toDouble; i += 1 }
        val n = math.sqrt(acc)
        if (n == 0.0) v
        else {
          val o = new Array[Float](v.length)
          var j = 0
          while (j < v.length) { o(j) = (v(j).toDouble / n).toFloat; j += 1 }
          o
        }
      }
    require(sample.length >= ksub,
      s"PQ training needs >= ksub ($ksub) sample vectors, got ${sample.length}")
    val dim = sample.map(_.length).max
    val dsub = (dim + m - 1) / m
    (0 until m).map { mi =>
      val base = mi * dsub
      def sub(v: Array[Float]): Array[Float] =
        Array.tabulate(dsub)(d => if (base + d < v.length) v(base + d) else 0.0f)
      val subs = sample.map(sub)
      // deterministic init: first ksub sample subvectors (hash order)
      var cents = subs.take(ksub).map(_.clone())
      for (_ <- 0 until iters) {
        val sums = Array.fill(ksub)(new Array[Double](dsub))
        val counts = new Array[Int](ksub)
        subs.foreach { v =>
          var best = Double.MaxValue; var bestId = 0
          var j = 0
          while (j < ksub) {
            var dist = 0.0; var d = 0
            while (d < dsub) { val x = v(d) - cents(j)(d); dist += x * x; d += 1 }
            if (dist < best || (dist == best && j > bestId)) { best = dist; bestId = j }
            j += 1
          }
          counts(bestId) += 1
          var d = 0
          while (d < dsub) { sums(bestId)(d) += v(d); d += 1 }
        }
        cents = cents.zipWithIndex.map { case (old, j) =>
          if (counts(j) == 0) old // empty cell keeps its centroid
          else Array.tabulate(dsub)(d => (sums(j)(d) / counts(j)).toFloat)
        }
      }
      cents.map(_.toSeq).toSeq
    }
  }

  /** Unit-normalize a float vector (cosine = dot of unit vectors);
    * zero vectors stay zero.
    */
  private def normalize(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val n = sqrt(aggregate(v.cast("array<float>"),
      lit(0.0d), (acc, x) => acc + x.cast("double") * x.cast("double")))
    transform(v.cast("array<float>"),
      x => when(n === 0.0d, x).otherwise((x.cast("double") / n).cast("float")))
  }

  /** PQ top-k: ADC-score every corpus CODE against each probe's lookup
    * table (O(m) per pair over broadcast probe LUTs — the only
    * data-scaled pass touches codes, not vectors), keep `refine·k`
    * candidates per probe, then re-rank exactly on the true vectors.
    */
  def annTopK(corpus: DataFrame, probes: DataFrame, k: Int,
              m: Int = 8, ksub: Int = 16, refine: Int = 10,
              sampleN: Int = 1024, iters: Int = 5,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cb = trainCodebooks(corpus, m, ksub, sampleN, iters, idCol, vecCol)
    val encoded = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("vec"))
      .withColumn("_codes", pq_encode(normalize(col("vec")), cb))
    val probeLuts = probes
      .select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec"))
      .withColumn("_lut", pq_lut(normalize(col("probe_vec")), cb))
    val wAdc = Window.partitionBy(col("probe_id"))
      .orderBy(col("_adc").desc, col("neighbor_id"))
    val candidates = encoded.crossJoin(broadcast(probeLuts))
      .where(col("probe_id") =!= col("neighbor_id"))
      .withColumn("_adc", pq_adc(col("_lut"), col("_codes"), ksub))
      .withColumn("_ark", row_number().over(wAdc))
      .where(col("_ark") <= refine * k)
    val wExact = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    candidates
      .withColumn("sim", cosine_sim(col("probe_vec"), col("vec")))
      .withColumn("rank", row_number().over(wExact))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("neighbor_id"), col("sim"))
  }

  /** IVFADC (Jégou et al. 2011 §III; FAISS `IVFx,PQy`) — the two prior
    * index families composed the way a billion-vector deployment
    * actually runs them: IVF prunes WHICH vectors are scored
    * (`nprobe/nlist` of the corpus), PQ shrinks WHAT a scored
    * candidate costs (m code ints via a broadcast per-probe LUT), and
    * only the `refine·k` ADC shortlist ever touches a true vector for
    * the exact cosine re-rank.
    *
    * Scale shape: both index artifacts are driver-bounded by
    * parameters (nlist centroids, sampleN-trained codebooks), shipped
    * into scan-stage expressions — assignment and encoding add zero
    * shuffles to the corpus scan. The search joins probe→cells
    * (broadcast: probes × nprobe rows) to codes on `centroid_id`, so
    * the ADC pass is partitioned by cell and scores
    * ~nprobe/nlist · |corpus| codes per probe; the re-rank is
    * per-probe-top-k window work over refine·k rows.
    */
  def ivfAdcTopK(corpus: DataFrame, probes: DataFrame, k: Int,
                 nlist: Int = 16, nprobe: Int = 4,
                 m: Int = 8, ksub: Int = 16, refine: Int = 10,
                 sampleN: Int = 1024, iters: Int = 5,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val centArr = IvfAnn.centroidArray(corpus, nlist, idCol, vecCol)
    val cb = trainCodebooks(corpus, m, ksub, sampleN, iters, idCol, vecCol)
    val encoded = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("vec"))
      .withColumn("centroid_id", centroid_argmax(col("vec"), centArr))
      .withColumn("_codes", pq_encode(normalize(col("vec")), cb))

    val cents = IvfAnn.centroidsDf(corpus.sparkSession, centArr)
    // the m·ksub-float LUT attaches AFTER the nprobe prune: computed
    // per surviving (probe, cell) row instead of materialized once per
    // centroid and dragged through the ranking window's shuffle
    val probeCells = probes
      .select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec"))
      .join(broadcast(cents))
      .withColumn("_sim", cosine_sim(col("probe_vec"), col("centroid_vec")))
      .withColumn("_crk", row_number().over(
        Window.partitionBy(col("probe_id")).orderBy(col("_sim").desc, col("centroid_id"))))
      .where(col("_crk") <= nprobe)
      .select(col("probe_id"), col("probe_vec"),
        pq_lut(normalize(col("probe_vec")), cb).as("_lut"), col("centroid_id"))

    val wAdc = Window.partitionBy(col("probe_id"))
      .orderBy(col("_adc").desc, col("neighbor_id"))
    val wExact = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    encoded.join(broadcast(probeCells), Seq("centroid_id"))
      .where(col("probe_id") =!= col("neighbor_id"))
      .withColumn("_adc", pq_adc(col("_lut"), col("_codes"), ksub))
      .withColumn("_ark", row_number().over(wAdc))
      .where(col("_ark") <= refine * k)
      .withColumn("sim", cosine_sim(col("probe_vec"), col("vec")))
      .withColumn("rank", row_number().over(wExact))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("neighbor_id"), col("sim"))
  }
}
