package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** REST/JSON source (reference S9: the historical tutorial DAG fetched
  * `astros.json` and fanned rows out of the `people` array —
  * exampledag.pyc; SURVEY.md §2.1).
  *
  * The environment has zero egress, so the HTTP fetch is a caller-
  * supplied function (`fetch: () => String`); everything after the
  * payload — JSON parsing, array fan-out, schema projection — is the
  * engine's job and fully implemented: payload → `from_json` →
  * `explode` rows. For large payload sets, pass many payloads and they
  * parallelize as a DataFrame of documents.
  */
object RestSource {

  /** Rows from a single JSON payload: `arrayField` is exploded, its
    * struct fields become columns.
    */
  def fromPayload(spark: SparkSession, payload: String,
                  schema: StructType, arrayField: String): DataFrame =
    fromPayloads(spark, Seq(payload), schema, arrayField)

  /** Many payloads (e.g. one per paginated fetch), parallelized. */
  def fromPayloads(spark: SparkSession, payloads: Seq[String],
                   schema: StructType, arrayField: String): DataFrame = {
    import spark.implicits._
    payloads.toDF("payload")
      .select(from_json($"payload", schema).as("doc"))
      .select(explode(col(s"doc.$arrayField")).as("row"))
      .select(col("row.*"))
  }
}
