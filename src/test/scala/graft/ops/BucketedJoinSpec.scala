package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.Tables

class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("bucketed join is exchange-free and correct") {
    val t = Tables(spark, dir)
    BucketedJoin.writeBucketed(t.orders, "b_orders", "o_orderkey", 8)
    BucketedJoin.writeBucketed(
      t.lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", "o_orderkey", 8)

    val joined = BucketedJoin.join(spark, "b_orders", "b_lineitem", "o_orderkey")
    assert(!BucketedJoin.hasShuffle(joined), "bucketed join should not shuffle:\n" +
      joined.queryExecution.executedPlan.toString)

    // same answer as the plain (shuffling) join
    val plain = t.orders.join(
      t.lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey")
    assert(joined.count() === plain.count())

    // control: with broadcast disabled (as at real scale, where neither
    // side fits), the non-bucketed join must shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val shuffled = t.orders.join(
        t.lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey")
      assert(BucketedJoin.hasShuffle(shuffled), "plain join expected to shuffle")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
