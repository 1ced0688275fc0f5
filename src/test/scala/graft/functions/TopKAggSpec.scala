package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The custom top-k aggregate's contract: exact (= window-form)
  * results through the partial/serialize/merge/final path, total-order
  * tiebreak, aggregate null semantics, and the SQL registration.
  */
class TopKAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def explodeTop(df: org.apache.spark.sql.DataFrame) =
    df.select($"g", posexplode($"top"))
      .select($"g", $"pos", $"col.score", $"col.item")
      .orderBy($"g", $"pos")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getString(3)))

  test("exact top-k across many partitions (partial merge + serialization)") {
    // 26 partitions force map-side partials that serialize and merge;
    // expected rows are computable by hand: scores 0..999 split by parity
    val rows = (0 until 1000).map(i => (if (i % 2 == 0) "even" else "odd", i.toDouble, s"it$i"))
    val df = rows.toDF("g", "s", "i").repartition(26)
    val got = explodeTop(df.groupBy($"g").agg(TopKFunctions.topk_by($"s", $"i", 3).as("top")))
    assert(got.toSeq == Seq(
      ("even", 0, 998.0, "it998"), ("even", 1, 996.0, "it996"), ("even", 2, 994.0, "it994"),
      ("odd", 0, 999.0, "it999"), ("odd", 1, 997.0, "it997"), ("odd", 2, 995.0, "it995")))
  }

  test("ties break item-ascending; k larger than group truncates; nulls skipped") {
    val df = Seq(
      ("a", Some(1.0), Some("z")), ("a", Some(1.0), Some("y")), ("a", Some(2.0), Some("x")),
      ("a", None, Some("w")), ("a", Some(9.0), None),
      ("b", Some(5.0), Some("only"))
    ).toDF("g", "s", "i")
    val got = explodeTop(df.groupBy($"g").agg(TopKFunctions.topk_by($"s", $"i", 10).as("top")))
    assert(got.toSeq == Seq(
      ("a", 0, 2.0, "x"), ("a", 1, 1.0, "y"), ("a", 2, 1.0, "z"),
      ("b", 0, 5.0, "only")))
  }

  test("SQL surface: topk_by(score, item, k) with coercing casts") {
    Seq(("g1", 10L, 7), ("g1", 20L, 8), ("g1", 30L, 9)).toDF("g", "s", "i")
      .createOrReplaceTempView("tk_in")
    val got = spark.sql(
      "SELECT g, topk_by(s, i, 2) AS top FROM tk_in GROUP BY g")
      .select($"g", posexplode($"top"))
      .select($"g", $"col.score", $"col.item")
      .orderBy($"col.score".desc)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getString(2)))
    assert(got.toSeq == Seq(("g1", 30.0, "9"), ("g1", 20.0, "8")))
  }

  test("matches the row_number window form on random data") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 500).map(_ =>
      (s"g${rnd.nextInt(7)}", rnd.nextInt(20).toDouble, s"x${rnd.nextInt(1000)}"))
    val df = rows.toDF("g", "s", "i").repartition(11)
    val agg = explodeTop(df.groupBy($"g").agg(TopKFunctions.topk_by($"s", $"i", 5).as("top")))
      .map { case (g, pos, s, i) => (g, pos + 1, s, i) }
    import org.apache.spark.sql.expressions.Window
    val win = df.withColumn("rk", row_number().over(
        Window.partitionBy($"g").orderBy($"s".desc, $"i".asc)))
      .where($"rk" <= 5).orderBy($"g", $"rk")
      .collect().map(r => (r.getString(0), r.getInt(3), r.getDouble(1), r.getString(2)))
    assert(agg.toSeq == win.toSeq)
  }
}
