package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Helpers that keep query results bit-identical between Spark and the
  * DuckDB oracle the driver runs (BASELINE.md "t2").
  *
  * Floating-point aggregation order differs across engines (and across
  * Spark partitionings), so summing raw doubles is nondeterministic in
  * the last ulps — enough to break a hash compare. The fixture columns
  * are all money/quantity values with <= 4 decimal digits, so we route
  * every SUM/AVG through exact decimal arithmetic and cast the final
  * value back to double: both engines then round the same exact decimal
  * to the same nearest double.
  */
object SqlCompat {
  /** Exact-decimal view of a <=4-decimal-digit double column. */
  def dec(c: Column): Column = c.cast("decimal(18,4)")

  /** Order-independent, cross-engine-stable SUM of a double column. */
  def sumd(c: Column): Column = sum(dec(c)).cast("double")

  /** Stable AVG: exact decimal sum, then one double division. */
  def avgd(c: Column): Column = sum(dec(c)).cast("double") / count(lit(1))

  /** A wall-clock literal interpreted as UTC regardless of the JVM
    * default timezone. `java.sql.Timestamp.valueOf` parses in the
    * default zone, which would make query results (and DuckDB-oracle
    * parity, whose naive timestamps are UTC) depend on the driver
    * machine's TZ.
    */
  def utcTimestamp(s: String): java.sql.Timestamp =
    java.sql.Timestamp.from(
      java.time.LocalDateTime.parse(s.replace(' ', 'T'))
        .toInstant(java.time.ZoneOffset.UTC))
}
