package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * One `spark.read.parquet` per table — schema comes from the parquet
  * footer (the reference also infers all schemas; SURVEY.md §1.3).
  * Reads are lazy `DataFrame`s: Catalyst pushes filters/projections
  * into the vectorized parquet scan, so callers should never pre-cache
  * or collect here.
  */
object Tables {
  /** TIMESTAMP(NANOS) parquet read as raw long (legacy conf) → µs
    * TimestampType, truncating exactly like DuckDB reads the same
    * file. Single definition — batch and streaming paths share it so
    * the oracle-proven stream/batch parity cannot drift.
    *
    * Built as a Catalyst `IntegralDivide` through the Column bridge —
    * string-splicing `c.toString` into `expr(...)` only parses for
    * simple named columns and would silently misbind for aliased or
    * computed inputs. Integer division (not `/ 1000.0`) because
    * epoch-nanos longs exceed 2^53 and would lose precision as doubles.
    */
  def tsFromNanos(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.catalyst.expressions.{IntegralDivide, Literal}
    org.apache.spark.sql.functions.timestamp_micros(GraftColumnBridge.column(
      IntegralDivide(GraftColumnBridge.expression(c.cast("long")), Literal(1000L))))
  }
}

final case class Tables(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = table("region")
  def nation: DataFrame     = table("nation")
  def customer: DataFrame   = table("customer")
  def supplier: DataFrame   = table("supplier")
  def part: DataFrame       = table("part")
  def orders: DataFrame     = table("orders")
  def lineitem: DataFrame   = table("lineitem")

  /** `events.ts` is TIMESTAMP(NANOS) parquet, which Spark's vectorized
    * reader rejects. Read it as raw nanos (legacy conf) and truncate to
    * microseconds — exactly what DuckDB does on the same file, so the
    * oracle compare stays exact. Integer division (`div`) avoids the
    * double-precision loss a `/ 1000` would give on epoch-nanos longs.
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table("events").withColumn("ts", Tables.tsFromNanos(org.apache.spark.sql.functions.col("ts")))
  }

  /** Events filtered by `ts > lowerBound` with the comparison done in
    * the raw nanos domain, BEFORE the µs conversion: the predicate then
    * reaches the parquet scan as a plain long comparison
    * (`PushedFilters: [GreaterThan(ts, ...)]`), so row groups and files
    * outside the watermark are pruned from stats. Filtering the
    * converted column instead wraps `ts` in `timestamp_micros(div)` and
    * forfeits stats pruning — at 100 TB that is a full-lake scan.
    */
  def eventsAfter(lowerBound: java.sql.Timestamp): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // coarse raw-domain bound (superset of the exact predicate: any row
    // whose truncated µs exceeds the bound has raw ns exceeding it too)
    val lowerNanos = lowerBound.getTime * 1000000L // ms → ns
    table("events")
      .filter(col("ts") > lowerNanos)                       // pushed to parquet stats
      .withColumn("ts", Tables.tsFromNanos(col("ts")))
      .filter(col("ts") > lit(lowerBound))                  // exact, truncation-aware
  }
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")
}
