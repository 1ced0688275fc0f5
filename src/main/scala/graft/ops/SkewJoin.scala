package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual fallback when AQE's
  * skew-join splitting isn't available (non-shuffle-stage inputs,
  * pre-3.0 clusters) or when one hot key dominates so heavily that a
  * deterministic fan-out is preferable (SURVEY.md §4 / builder brief:
  * "salting for skew").
  *
  * Left side gets a uniform random-ish salt in [0, buckets); the
  * (small-ish) right side is replicated `buckets` times with every
  * salt value, so each hot-key partition shrinks by `buckets`×. The
  * salt mixes the key hash with a per-row id that depends on physical
  * partitioning — bucket assignment may differ between runs, but the
  * join RESULT is identical either way (every salt value has a
  * matching replicated right row).
  */
object SkewJoin {

  /** Inner equi-join `left(key) = right(key)` with `buckets`-way
    * salting. `rightSmall` is replicated buckets× — size accordingly.
    */
  def saltedInnerJoin(left: DataFrame, rightSmall: DataFrame, key: String,
                      buckets: Int = 16): DataFrame = {
    require(buckets >= 2, "need at least 2 salt buckets")
    val l = left.withColumn("_salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(buckets)).cast("int"))
    val r = rightSmall
      .withColumn("_salt", explode(sequence(lit(0), lit(buckets - 1))))
      .withColumn("_salt", col("_salt").cast("int"))
      .withColumnRenamed(key, s"_r_$key")
    l.join(r, l("_salt") === r("_salt") && l(key) === r(s"_r_$key"))
      .drop("_salt").drop(s"_r_$key")
  }
}
