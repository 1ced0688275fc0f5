package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact heavy hitters (frequent items) via a Misra-Gries candidate
  * pass + exact verification — the third canonical mergeable sketch
  * next to HLL (`a_approx_distinct`) and KLL (`a_approx_percentile`),
  * used where those two cannot help: "which items occur at least T
  * times in the corpus" (hot tokens, hot keys for salting decisions,
  * boilerplate vocabulary).
  *
  * Output is IDENTICAL to `GROUP BY item HAVING count(*) >= minCount`
  * (pinned by the `t_heavy_hitters` oracle). The two-pass shape is
  * what changes at scale:
  *
  *  - Pass 1 streams each partition through a Misra-Gries summary of
  *    `k` counters (constant memory, one pass, no shuffle) and emits
  *    the surviving items. `k` is sized so completeness is GUARANTEED
  *    by pigeonhole: an item with global count ≥ n/k must have
  *    count ≥ n_p/k in at least one partition p (else its total would
  *    be < n/k), and Misra-Gries with k counters retains every item
  *    with partition-local count > n_p/(k+1). With
  *    `k = n/minCount + 1`, every true heavy hitter is a candidate.
  *  - Pass 2 semi-joins the corpus against the BROADCAST candidate
  *    set and counts exactly. The group-by exchange therefore carries
  *    only candidate items — bounded by k × partitions — instead of
  *    the full item domain (for text, the whole vocabulary). False
  *    candidates are eliminated here, so the sketch's approximation
  *    never reaches the result.
  *
  * The candidate set never lands on the driver: it stays a DataFrame
  * and ships to executors via the broadcast exchange.
  */
object HeavyHitters {

  /** Items of `items(itemCol)` occurring at least `max(1, n/nth)`
    * times, with exact counts — e.g. `nth = 200` → "items covering at
    * least 1/200th of the corpus". Thresholding by fraction keeps the
    * query meaningful at every scale factor AND bounds the sketch: the
    * counter budget is `k = nth + 1` regardless of corpus size.
    */
  def exactNth(items: DataFrame, itemCol: String, nth: Long): DataFrame = {
    require(nth >= 1, s"nth must be >= 1, got $nth")
    val n = items.count()
    exact(items, itemCol, math.max(1L, n / nth), n)
  }

  /** Items occurring at least `minCount` times, with exact counts.
    * `totalCount` (= `items.count()`) sizes the sketch; pass it when
    * already known to avoid a second count job.
    */
  /** Counter-budget ceiling: past it the sketch's memory would rival
    * the aggregation it replaces, so the op degrades LOUDLY to the
    * plain exact aggregate instead of silently weakening the
    * pigeonhole guarantee (a capped k admits false negatives — the
    * one thing this op promises not to have).
    */
  val MaxCounters: Int = 10_000_000

  def exact(items: DataFrame, itemCol: String, minCount: Long,
            totalCount: Long): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val spark = items.sparkSession
    import spark.implicits._
    // k counters guarantee candidacy for count >= n/k (pigeonhole, see
    // scaladoc); n/minCount + 1 makes minCount >= n/k strict
    val kLong = totalCount / minCount + 1L
    if (kLong > MaxCounters) {
      // threshold too fine for a bounded sketch: the exact aggregate
      // is the only formulation that keeps the contract
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"HeavyHitters: counter budget $kLong exceeds $MaxCounters; " +
          "running the plain exact aggregate (no sketch)")
      return items.select(col(itemCol))
        .groupBy(col(itemCol))
        .agg(count(lit(1)).as("n"))
        .where(col("n") >= minCount)
    }
    val k = kLong.toInt
    val ds = items.select(col(itemCol).cast("string")).as[String]
    val candidates = ds.mapPartitions { it =>
      val counters = new scala.collection.mutable.HashMap[String, Long]
      it.foreach { w =>
        val cur = counters.getOrElse(w, -1L)
        if (cur >= 0L) counters(w) = cur + 1L
        else if (counters.size < k) counters(w) = 1L
        else {
          // classic decrement-all step: O(k) amortized over the >= k
          // inserts that must precede it
          counters.mapValuesInPlace((_, v) => v - 1L)
          counters.filterInPlace((_, v) => v > 0L)
        }
      }
      counters.keysIterator
    }.toDF(itemCol).distinct()
    // null-safe join: a null item is a legitimate GROUP BY group, and
    // the declared equivalence includes it — a plain equi-join would
    // silently drop a heavy null group
    items.select(col(itemCol))
      .join(broadcast(candidates),
        items(itemCol) <=> candidates(itemCol))
      .select(items(itemCol))
      .groupBy(col(itemCol))
      .agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount)
  }
}
