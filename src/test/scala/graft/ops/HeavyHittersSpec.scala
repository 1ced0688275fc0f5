package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Heavy hitters: the Misra-Gries candidate pass must be invisible in
  * the result (exact equality with the naive GROUP BY/HAVING) under
  * real sketch pressure — vocabulary far larger than the counter
  * budget — and invariant to how the corpus is partitioned.
  */
class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 100k items: 7 hot values (~4.3k each) over a 5000-value cold tail
  // (~14 each). minCount 1000 → k = 101 counters per partition, ~50×
  // smaller than the vocabulary — the sketch must actually discard.
  private lazy val skewed = spark.range(100000L)
    .select(when(col("id") % 10 < 3, concat(lit("hot"), col("id") % 7))
      .otherwise(concat(lit("cold"), col("id") % 5000)).as("item"))

  private def naive(minCount: Long) =
    skewed.groupBy($"item").agg(count(lit(1)).as("n"))
      .where($"n" >= minCount)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSet

  test("exact equality with naive GROUP BY/HAVING under sketch pressure") {
    val got = HeavyHitters.exact(skewed, "item", 1000L, 100000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSet
    val want = naive(1000L)
    assert(want.nonEmpty && want.size < 20, s"fixture sanity: ${want.size}")
    assert(got === want)
  }

  test("result is invariant to partitioning") {
    val want = naive(1000L)
    for (p <- Seq(1, 7, 32)) {
      val got = HeavyHitters.exact(skewed.repartition(p), "item", 1000L, 100000L)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSet
      assert(got === want, s"diverged at $p partitions")
    }
  }

  test("threshold at the boundary keeps every qualifying item (completeness)") {
    // minCount exactly at a hot item's count: that item must appear —
    // the pigeonhole guarantee, not best-effort sketch recall
    val counts = naive(1L)
    val hotMin = counts.filter(_._1.startsWith("hot")).map(_._2).min
    val got = HeavyHitters.exact(skewed, "item", hotMin, 100000L)
      .collect().map(_.getString(0)).toSet
    assert(counts.filter(_._2 >= hotMin).map(_._1).subsetOf(got))
    assert(got === counts.filter(_._2 >= hotMin).map(_._1))
  }

  test("counter budget over the ceiling falls back to the plain exact aggregate") {
    // an absurd totalCount forces k past MaxCounters; the contract
    // (exact GROUP BY/HAVING equivalence) must survive via fallback
    val got = HeavyHitters.exact(skewed, "item", 1000L, totalCount = 1L << 40)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSet
    assert(got === naive(1000L))
  }

  test("a heavy null group is reported, matching GROUP BY semantics") {
    val withNulls = skewed
      .select(when(col("item").startsWith("hot0"), lit(null: String))
        .otherwise(col("item")).as("item"))
    val want = withNulls.groupBy($"item").agg(count(lit(1)).as("n"))
      .where($"n" >= 1000L)
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toSet
    assert(want.exists(_._1.isEmpty), "fixture sanity: null group is heavy")
    val got = HeavyHitters.exact(withNulls, "item", 1000L, 100000L)
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toSet
    assert(got === want)
  }

  test("exactNth derives the same threshold as floor(n/nth)") {
    val got = HeavyHitters.exactNth(skewed, "item", 30L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSet
    assert(got === naive(100000L / 30L))
  }
}
