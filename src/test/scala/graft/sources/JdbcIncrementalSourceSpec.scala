package graft.sources

import java.nio.file.Files
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.state.WatermarkStore

/** No database exists in this environment (SURVEY.md §7.1), so the
  * JDBC source is tested at the interface level: option resolution and
  * the watermark delta filter (the parts that are pure), with the
  * filter applied to a local frame standing in for the JDBC relation.
  */
class JdbcIncrementalSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("options carry pushdown + partitioned-read settings") {
    val st = new WatermarkStore(Files.createTempDirectory("jdbc-spec-"))
    val cfg = JdbcConfig("jdbc:postgresql://dwh/db", "public.customer_data",
      "u", "p", partitionColumn = Some("customer_id"), numPartitions = 16,
      lowerBound = 1, upperBound = 1000000)
    val src = new JdbcIncrementalSource(spark, cfg, st, "etl")
    val o = src.options
    assert(o("dbtable") === "public.customer_data")
    assert(o("pushDownPredicate") === "true")
    assert(o("numPartitions") === "16" && o("partitionColumn") === "customer_id")
  }

  test("delta filter honors the watermark and commit advances it") {
    val st = new WatermarkStore(Files.createTempDirectory("jdbc-spec2-"))
    val cfg = JdbcConfig("jdbc:postgresql://dwh/db", "t", "u", "p")
    val src = new JdbcIncrementalSource(spark, cfg, st, "etl")
    val rows = Seq(
      (1L, ts("2024-01-01 00:00:00")),
      (2L, ts("2024-01-02 00:00:00")),
      (3L, ts("2024-01-03 00:00:00"))).toDF("id", "last_updated")

    // epoch watermark → everything
    assert(src.delta(rows, "last_updated").count() === 3)
    src.commit(rows, "last_updated")
    assert(st.get("etl", "extract") === ts("2024-01-03 00:00:00"))
    // second pass: strictly-later rows only (at-most-once per version)
    assert(src.delta(rows, "last_updated").count() === 0)
    val more = rows.unionByName(Seq((4L, ts("2024-01-04 00:00:00"))).toDF("id", "last_updated"))
    assert(src.delta(more, "last_updated").select("id").as[Long].collect() === Array(4L))
  }
}
