package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Guards against fixture-layout drift — the round-5 incident: the
  * driver regenerated `events.parquet` from TIMESTAMP(NANOS) (which
  * loads as a raw long under the legacy conf) to `timestamp[us]` NTZ,
  * and every loader that hard-assumed one layout broke at analysis
  * time. The loaders now dispatch on the loaded type
  * ([[Tables.normalizeTs]]); this spec materializes the SAME rows in
  * all three physical layouts the driver has shipped (raw nanos long,
  * micros NTZ, tz-micros) and asserts batch load, watermark scan, and
  * the windowed aggregate return identical results on each — so the
  * next regeneration is caught here, not by the driver.
  */
class TablesLayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** events rows in every physical ts layout, same logical values. */
  private lazy val layoutDirs: Map[String, String] = {
    val src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val asTs = Tables.normalizeTs(src) // canonical TimestampType rows
    val variants: Map[String, org.apache.spark.sql.DataFrame] = Map(
      // TIMESTAMP(NANOS) fixtures load as LongType epoch-nanos under
      // spark.sql.legacy.parquet.nanosAsLong — simulated directly
      "nanos-long" -> asTs.withColumn("ts", unix_micros($"ts") * 1000L),
      "micros-ntz" -> asTs.withColumn("ts", $"ts".cast("timestamp_ntz")),
      "micros-tz"  -> asTs)
    variants.map { case (name, df) =>
      val dir = Files.createTempDirectory(s"layout-$name-").toString
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
      name -> dir
    }
  }

  private def canonical(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  test("batch events load is layout-invariant (type dispatches, values identical)") {
    val loaded = layoutDirs.map { case (name, dir) =>
      val ev = Tables(spark, dir).events
      assert(ev.schema("ts").dataType ===
        org.apache.spark.sql.types.TimestampType, s"layout $name")
      name -> canonical(ev)
    }
    val expect = loaded("micros-tz")
    loaded.foreach { case (name, rows) =>
      assert(rows === expect, s"layout $name diverged from canonical")
    }
  }

  test("watermark scan (eventsAfter) is layout-invariant and still prunes on the stored column") {
    val bound = SqlCompat.utcTimestamp("2024-01-28 00:00:00")
    val results = layoutDirs.map { case (name, dir) =>
      val df = Tables(spark, dir).eventsAfter(bound)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      // the bound must reach the parquet scan in EVERY layout — the
      // filter compares the STORED column, conversion happens above it
      assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThan(ts,"),
        s"layout $name lost pushdown:\n$plan")
      name -> canonical(df)
    }
    val expect = results("micros-tz")
    assert(expect.nonEmpty)
    results.foreach { case (name, rows) =>
      assert(rows === expect, s"layout $name diverged from canonical")
    }
  }

  test("windowed aggregate over events is layout-invariant") {
    val results = layoutDirs.map { case (name, dir) =>
      name -> canonical(
        streaming.EventsWindows.tumblingBatch(Tables(spark, dir).events))
    }
    val expect = results("micros-tz")
    assert(expect.nonEmpty)
    results.foreach { case (name, rows) =>
      assert(rows === expect, s"layout $name diverged from canonical")
    }
  }
}
