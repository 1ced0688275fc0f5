package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.TestSpark

class RestSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // the astros.json shape the reference's tutorial DAG consumed
  private val schema = StructType(Seq(
    StructField("message", StringType),
    StructField("number", IntegerType),
    StructField("people", ArrayType(StructType(Seq(
      StructField("name", StringType),
      StructField("craft", StringType)))))))

  test("payload fans out to one row per array element") {
    val payload =
      """{"message":"success","number":2,
        | "people":[{"name":"A","craft":"ISS"},{"name":"B","craft":"ISS"}]}""".stripMargin
    val df = RestSource.fromPayload(spark, payload, schema, "people")
    assert(df.columns.toSeq === Seq("name", "craft"))
    assert(df.as[(String, String)].collect().toSet === Set(("A", "ISS"), ("B", "ISS")))
  }

  test("multiple payloads parallelize and concatenate") {
    val p1 = """{"message":"s","number":1,"people":[{"name":"A","craft":"X"}]}"""
    val p2 = """{"message":"s","number":1,"people":[{"name":"B","craft":"Y"}]}"""
    val df = RestSource.fromPayloads(spark, Seq(p1, p2), schema, "people")
    assert(df.count() === 2)
  }

  test("malformed payload yields no rows, not an exception") {
    val df = RestSource.fromPayload(spark, "not json at all", schema, "people")
    assert(df.count() === 0)
  }
}
