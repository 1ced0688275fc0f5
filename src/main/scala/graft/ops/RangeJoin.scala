package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned range join: point-in-interval joins without a nested-loop
  * plan.
  *
  * Spark executes a join whose condition is pure inequality (`p.ts
  * BETWEEN i.lo AND i.hi`) as BroadcastNestedLoopJoin or a cartesian
  * product — O(|points| · |intervals|) comparisons, a non-starter at
  * scale. The classic fix (the same one behind Databricks' range-join
  * bins and interval trees in single-node engines): quantize time into
  * fixed-width bins, replicate each interval to every bin it covers,
  * map each point to its one bin, and equi-join on (keys, bin) — a
  * plain shuffled hash/sort-merge join — then re-apply the exact
  * interval predicate. A (point, interval) pair meets in exactly ONE
  * bin (the point's), so no dedup step is needed.
  *
  * Cost model: replication factor = ceil(span / binWidth) + 1 per
  * interval; pairs compared = only key+bin co-located ones. Pick
  * `binSeconds` near the typical interval span — the standard
  * bin-size dial.
  */
object RangeJoin {

  /** Join `points` to `intervals` on equal `keys` AND `tsCol` ∈
    * [`loCol`, `hiCol`] (inclusive). Output: points.* ++ intervals.*
    * (keys once). Column names must not collide apart from `keys`.
    */
  def pointInInterval(points: DataFrame, tsCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      keys: Seq[String], binSeconds: Long): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    val binMicros = binSeconds * 1000000L
    val p = points.withColumn("_gr_bin",
      floor(unix_micros(col(tsCol)) / binMicros))
    val i = intervals.withColumn("_gr_bin",
      explode(sequence(
        floor(unix_micros(col(loCol)) / binMicros),
        floor(unix_micros(col(hiCol)) / binMicros))))
    p.join(i, keys :+ "_gr_bin")
      .where(col(tsCol) >= col(loCol) && col(tsCol) <= col(hiCol))
      .drop("_gr_bin")
  }
}
