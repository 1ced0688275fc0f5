package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shuffle-free co-located joins via bucketed tables — the 100 TB
  * answer to repeated fact-to-fact joins on the same key (SURVEY.md §4
  * "shuffle partitioning"; the reference never tunes partitioning).
  *
  * Both sides are written bucketed (`bucketBy(n, key)`) into the
  * session catalog's warehouse; Spark then plans a SortMergeJoin whose
  * children read pre-bucketed files — zero Exchange operators in the
  * joined plan. At scale this converts every subsequent join on the
  * bucket key from a full shuffle of both tables into a local merge.
  */
object BucketedJoin {

  /** Write `df` as a bucketed managed table (replacing it if present). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket key. Caller can assert
    * the plan is exchange-free via [[hasShuffle]].
    */
  def join(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** True iff the physical plan contains a shuffle Exchange. Matches on
    * the plan text because AQE wraps the tree in AdaptiveSparkPlanExec,
    * whose children are not traversable via `plan.exists` before
    * execution.
    */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
