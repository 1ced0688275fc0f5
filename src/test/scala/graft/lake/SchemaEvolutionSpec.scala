package graft.lake

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The reference absorbs schema drift by overwriting (SURVEY.md §1.3);
  * the lake layer additionally supports additive evolution on append:
  * the manifest carries the latest schema and old parquet files
  * back-fill missing columns with nulls.
  */
class SchemaEvolutionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("append with an added column: old rows read as null") {
    val cat = new LakeCatalog(spark, Files.createTempDirectory("evo-").toString)
    cat.write(Seq((1L, "a")).toDF("id", "s"), "ns.t", WriteMode.Overwrite)
    cat.write(Seq((2L, "b", 9.5)).toDF("id", "s", "score"), "ns.t", WriteMode.Append)
    val rows = cat.read("ns.t").orderBy($"id").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(rows(0).isNullAt(2))            // back-filled
    assert(rows(1).getDouble(2) === 9.5)
  }

  test("overwrite with a narrower schema replaces cleanly") {
    val cat = new LakeCatalog(spark, Files.createTempDirectory("evo2-").toString)
    cat.write(Seq((1L, "a", 1.0)).toDF("id", "s", "x"), "ns.t", WriteMode.Overwrite)
    cat.write(Seq((2L, "b")).toDF("id", "s"), "ns.t", WriteMode.Overwrite)
    assert(cat.read("ns.t").columns.toSeq === Seq("id", "s"))
    // old snapshot still time-travels with its own schema
    assert(cat.read("ns.t", Some(1L)).columns.toSeq === Seq("id", "s", "x"))
  }

  test("registerView exposes lake snapshots to spark.sql") {
    val cat = new LakeCatalog(spark, Files.createTempDirectory("evo3-").toString)
    cat.write(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v"), "gold.metrics", WriteMode.Overwrite)
    val view = cat.registerView("gold.metrics")
    assert(view === "gold_metrics")
    val sum = spark.sql(s"SELECT CAST(SUM(v) AS DOUBLE) FROM $view").head.getDouble(0)
    assert(sum === 30.0)
  }
}
