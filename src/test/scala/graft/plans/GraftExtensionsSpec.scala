package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** Extensions apply at session build time; the shared TestSpark session
  * is built `.withExtensions(new GraftExtensions)` (a second builder
  * calling getOrCreate would silently reuse the existing session and
  * drop the extensions).
  */
class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.TestSpark.spark

  test("custom expressions callable from SQL") {
    spark.sparkContext.setLogLevel("WARN")
    val row = spark.sql(
      """SELECT
        |  cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |             array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS self_sim,
        |  cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |             array(CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT))) AS ortho_sim,
        |  size(minhash_sig(array('a b c', 'b c d'), 16)) AS sig_len,
        |  simhash64(array('x', 'y')) = simhash64(array('x', 'y')) AS sh_det,
        |  word_shingles(array('a', 'b', 'c', 'b', 'c'), 2) AS sh2
        |""".stripMargin).head
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(row.getDouble(1)) < 1e-12)
    assert(row.getInt(2) === 16)
    assert(row.getBoolean(3))
    assert(row.getSeq[String](4) === Seq("a b", "b c", "c b"))
  }

  test("round-2 expressions callable from SQL") {
    val row = spark.sql(
      """SELECT
        |  token_count('abc 123, def!') AS tc,
        |  word_count('a  b c') AS wc,
        |  stop_count('the cat of war') AS sc,
        |  punct_count('a,b.c?') AS pc,
        |  has_cjk('中文') AS cjk,
        |  has_cjk('latin') AS nocjk,
        |  shingle_hashes(array('a', 'b', 'c'), 2) =
        |    array_sort(array_distinct(transform(word_shingles(array('a','b','c'), 2),
        |      s -> xxhash64(s)))) AS sh_eq,
        |  size(minhash_sig_hashes(array(CAST(7 AS BIGINT)), 8)) AS msh_len,
        |  length(zorder_code(CAST(1 AS BIGINT), CAST(2 AS BIGINT))) AS z_len
        |""".stripMargin).head
    assert(row.getInt(0) === 5)  // abc, 123, ',', def, '!'
    assert(row.getInt(1) === 3)
    assert(row.getInt(2) === 2)  // the, of
    assert(row.getInt(3) === 3)
    assert(row.getBoolean(4) && !row.getBoolean(5))
    assert(row.getBoolean(6))
    assert(row.getInt(7) === 8)
    assert(row.getInt(8) === 16)
  }

  test("bloom_might_contain callable from SQL with a binary-literal filter") {
    import org.apache.spark.util.sketch.BloomFilter
    val bf = BloomFilter.create(100, 0.01)
    (0L until 50L).foreach(i => bf.putLong(i * 2))
    val bos = new java.io.ByteArrayOutputStream(); bf.writeTo(bos)
    val hex = bos.toByteArray.map(b => f"$b%02x").mkString
    val rows = spark.sql(
      s"""SELECT v, bloom_might_contain(v, X'$hex') AS hit
         |FROM VALUES (4L), (5L), (98L), (99L) AS t(v)""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(rows(4L) && rows(98L), "members must hit (no false negatives)")
    // 5 and 99 are non-members; at fpp 1% both passing is ~1e-4 — treat
    // either rejecting as success to keep the test deterministic-enough
    assert(!rows(5L) || !rows(99L))
    // non-literal filter argument rejected loudly
    val e = intercept[Exception](
      spark.sql("SELECT bloom_might_contain(1L, CAST(NULL AS BINARY))").collect())
    assert(e.getMessage.toLowerCase.contains("binary literal") ||
      e.getCause != null)
  }

  test("non-literal k rejected with a clear error") {
    val e = intercept[Exception](
      spark.sql("SELECT minhash_sig(array('a'), 1 + 1)").head)
    assert(e.getMessage.contains("integer literal"))
  }

  test("FoldSelfCosine rewrites cosine_sim(x, x) and keeps semantics") {
    import spark.implicits._
    // parquet-backed: a LocalRelation would be constant-folded before
    // user optimizer rules run, hiding the rewrite
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb.createOrReplaceTempView("v_selfcos")
    val q = spark.sql("SELECT vec_id, cosine_sim(embedding, embedding) AS s FROM v_selfcos")
    // folded: rewritten to the norm_sq-guarded constant
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("norm_sq"), opt)
    // every self-similarity is EXACTLY 1.0 (numeric path gives 1-1ulp)
    val vals = q.select($"s").as[Double].collect()
    assert(vals.nonEmpty && vals.forall(_ === 1.0))
    // distinct columns are NOT folded
    val q2 = spark.sql("SELECT cosine_sim(embedding, reverse(embedding)) AS s FROM v_selfcos")
    assert(!q2.queryExecution.optimizedPlan.toString.contains("norm_sq"))
  }
}
