package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV source/sink (reference S7/S8: the historical DAG variants read
  * header+inferSchema CSV and wrote per-layer CSVs to object storage —
  * sparkmini.pyc / test-backup.pyc; SURVEY.md §2.1).
  *
  * Schema inference costs an extra pass over the data — at scale pass
  * an explicit schema (read) or let the caller capture `df.schema`
  * from a previous batch.
  */
object CsvSource {

  def read(spark: SparkSession, path: String, header: Boolean = true,
           schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("header", header.toString)
    schema match {
      case Some(s) => r.schema(s).csv(path)
      case None    => r.option("inferSchema", "true").csv(path)
    }
  }

  def write(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite").option("header", header.toString).csv(path)
}
