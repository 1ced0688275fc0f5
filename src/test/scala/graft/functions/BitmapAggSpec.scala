package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Exact-distinct bitmap segments: cardinalities must equal
  * count(distinct) under any partitioning (the merge path), set
  * algebra must equal real set ops, and the SQL surface must resolve.
  */
class BitmapAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import BitmapFunctions._

  private def df = {
    import spark.implicits._
    // overlapping id sets per group; duplicates within groups
    val rows = (for (i <- 0L until 400L) yield ("a", i % 37L)) ++
      (for (i <- 0L until 300L) yield ("b", i % 23L + 20L)) ++
      Seq(("a", -5L), ("b", -5L)) // negative ids must survive too
    rows.toDF("g", "id")
  }

  test("cardinality equals count(distinct) across the 26-partition merge path") {
    import spark.implicits._
    val got = df.repartition(26)
      .groupBy($"g").agg(bitmap64_count(bitmap64_agg($"id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = df.groupBy($"g").agg(countDistinct($"id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want)
    assert(got("a") === 38L) // 37 residues + the negative id
  }

  test("and/or counts equal real set intersections and unions") {
    import spark.implicits._
    val seg = df.groupBy($"g").agg(bitmap64_agg($"id").as("bm"))
    val a = seg.where($"g" === "a").select($"bm".as("abm"))
    val b = seg.where($"g" === "b").select($"bm".as("bbm"))
    val r = a.crossJoin(b)
      .select(bitmap64_and_count($"abm", $"bbm").as("i"),
        bitmap64_or_count($"abm", $"bbm").as("u"))
      .collect().head
    val sa = df.where($"g" === "a").select($"id").collect().map(_.getLong(0)).toSet
    val sb = df.where($"g" === "b").select($"id").collect().map(_.getLong(0)).toSet
    assert(r.getLong(0) === (sa & sb).size.toLong)
    assert(r.getLong(1) === (sa | sb).size.toLong)
  }

  test("or-agg unions already-aggregated segments to the exact global distinct") {
    import spark.implicits._
    val seg = df.repartition(13).groupBy($"g").agg(bitmap64_agg($"id").as("bm"))
    val merged = seg.agg(bitmap64_count(bitmap64_or_agg($"bm")).as("n")).collect().head.getLong(0)
    val want = df.select(countDistinct($"id")).collect().head.getLong(0)
    assert(merged === want)
  }

  test("null ids are ignored; SQL surface resolves all four functions") {
    import spark.implicits._
    Seq(Some(1L), None, Some(2L), Some(1L))
      .toDF("id").createOrReplaceTempView("bm_in")
    val out = spark.sql(
      """SELECT bitmap64_count(bm) AS n,
        |  bitmap64_and_count(bm, bm) AS i, bitmap64_or_count(bm, bm) AS u,
        |  bitmap64_count(bitmap64_or_agg(bm)) AS oa
        |FROM (SELECT bitmap64_agg(id) AS bm FROM bm_in)
        |GROUP BY bm""".stripMargin).collect().head
    assert(out.getLong(0) === 2L && out.getLong(1) === 2L &&
      out.getLong(2) === 2L && out.getLong(3) === 2L)
  }

  test("non-integral input is an analysis error, not a silent null-cast") {
    import spark.implicits._
    Seq("u1", "u2").toDF("id").createOrReplaceTempView("bm_str_in")
    // an unconditional Cast(LongType) would turn the string ids into
    // nulls and report an empty bitmap — type misuse must surface
    val ex = intercept[Exception] {
      spark.sql("SELECT bitmap64_count(bitmap64_agg(id)) FROM bm_str_in")
        .collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(_.getMessage != null) &&
      causes(ex).flatMap(c => Option(c.getMessage)).mkString
        .contains("integral id column"))
    // integral narrower-than-long ids still widen fine
    Seq(1, 2, 2).toDF("id").createOrReplaceTempView("bm_int_in")
    assert(spark.sql("SELECT bitmap64_count(bitmap64_agg(id)) AS n FROM bm_int_in")
      .collect().head.getLong(0) === 2L)
  }
}
