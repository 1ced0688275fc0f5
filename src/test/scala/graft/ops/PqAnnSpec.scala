package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.PqFunctions._

/** Product-quantization ANN: kernel consistency (encode → ADC equals a
  * hand-computed reconstruction score), determinism, bounded training
  * state, and end-to-end recall on planted near-duplicates.
  */
class PqAnnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic synthetic corpus: unit-ish 8-dim vectors in 4 clear
  // clusters + jitter, so quantization cells are unambiguous
  private def corpus(n: Int) = {
    val rows = (0 until n).map { i =>
      val c = i % 4
      val v = Array.tabulate(8)(d =>
        (if (d / 2 == c) 1.0f else 0.0f) + 0.01f * (((i * 31 + d * 7) % 11) - 5))
      (i.toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("ADC score equals the dot with the reconstructed vector, exactly") {
    val df = corpus(64)
    val cb = PqAnn.trainCodebooks(df, m = 4, ksub = 4, sampleN = 64, iters = 3)
    val enc = df.withColumn("_codes", pq_encode($"embedding", cb))
      .withColumn("_lut", pq_lut($"embedding", cb))
      .withColumn("_adc", pq_adc($"_lut", $"_codes", 4))
      .select($"embedding", $"_codes", $"_adc").collect()
    enc.foreach { r =>
      val v = r.getSeq[Float](0)
      val codes = r.getSeq[Int](1)
      // reconstruct from codebooks and dot with the SAME (query) vector
      val recon = codes.zipWithIndex.flatMap { case (c, mi) => cb(mi)(c) }
      val expect = v.zip(recon).map { case (a, b) => a.toDouble * b.toDouble }.sum
      assert(math.abs(r.getDouble(2) - expect) < 1e-4,
        s"ADC ${r.getDouble(2)} vs reconstruction dot $expect")
    }
  }

  test("codes are bounded by (m, ksub); training state bounded by the sample") {
    val df = corpus(200)
    val cb = PqAnn.trainCodebooks(df, m = 4, ksub = 8, sampleN = 50, iters = 2)
    assert(cb.length === 4)
    assert(cb.forall(_.length === 8))
    assert(cb.forall(_.forall(_.length === 2))) // 8 dims / 4 subspaces
    val codes = df.withColumn("_c", pq_encode($"embedding", cb))
      .select($"_c").collect().map(_.getSeq[Int](0))
    assert(codes.forall(c => c.length == 4 && c.forall(x => x >= 0 && x < 8)))
  }

  test("training is deterministic") {
    val df = corpus(100)
    val a = PqAnn.trainCodebooks(df, m = 2, ksub = 4, sampleN = 64, iters = 4)
    val b = PqAnn.trainCodebooks(df, m = 2, ksub = 4, sampleN = 64, iters = 4)
    assert(a === b)
  }

  test("planted near-duplicates are recovered exactly after the re-rank") {
    val base = corpus(128)
    // plant 3 near-copies of probes 0 and 1
    val planted = base.filter($"vec_id" < 2)
      .select(explode(array((1 to 3).map { j =>
        struct(($"vec_id" + lit(j * 1000L)).as("vec_id"),
          transform($"embedding", (x, i) =>
            when(i === 0, (x.cast("double") + lit(0.001 * j)).cast("float"))
              .otherwise(x)).as("embedding"))
      }: _*)).as("p"))
      .select($"p.vec_id".as("vec_id"), $"p.embedding".as("embedding"))
    val all = base.unionByName(planted)
    val probes = base.filter($"vec_id" < 2)
    val got = PqAnn.annTopK(all, probes, k = 3, m = 4, ksub = 8, refine = 8)
      .select($"probe_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact brute-force oracle
    import graft.functions.VectorFunctions.cosine_sim
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"probe_id").orderBy($"sim".desc, $"neighbor_id")
    val exact = probes.select($"vec_id".as("probe_id"), $"embedding".as("pv"))
      .crossJoin(all.select($"vec_id".as("neighbor_id"), $"embedding".as("nv")))
      .where($"probe_id" =!= $"neighbor_id")
      .withColumn("sim", cosine_sim($"pv", $"nv"))
      .withColumn("rk", row_number().over(w)).where($"rk" <= 3)
      .select($"probe_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === exact)
  }

  test("IVFADC (prune × compress × re-rank) recovers planted duplicates exactly") {
    val base = corpus(128)
    val planted = base.filter($"vec_id" < 2)
      .select(explode(array((1 to 3).map { j =>
        struct(($"vec_id" + lit(j * 1000L)).as("vec_id"),
          transform($"embedding", (x, i) =>
            when(i === 0, (x.cast("double") + lit(0.001 * j)).cast("float"))
              .otherwise(x)).as("embedding"))
      }: _*)).as("p"))
      .select($"p.vec_id".as("vec_id"), $"p.embedding".as("embedding"))
    val all = base.unionByName(planted)
    val probes = base.filter($"vec_id" < 2)
    val got = PqAnn.ivfAdcTopK(all, probes, k = 3,
        nlist = 8, nprobe = 3, m = 4, ksub = 8, refine = 8)
      .select($"probe_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    import graft.functions.VectorFunctions.cosine_sim
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"probe_id").orderBy($"sim".desc, $"neighbor_id")
    val exact = probes.select($"vec_id".as("probe_id"), $"embedding".as("pv"))
      .crossJoin(all.select($"vec_id".as("neighbor_id"), $"embedding".as("nv")))
      .where($"probe_id" =!= $"neighbor_id")
      .withColumn("sim", cosine_sim($"pv", $"nv"))
      .withColumn("rk", row_number().over(w)).where($"rk" <= 3)
      .select($"probe_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === exact)
  }
}
