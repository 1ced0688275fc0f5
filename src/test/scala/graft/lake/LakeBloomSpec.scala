package graft.lake

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Bloom-filter file skipping: equality probes on a declared bloom
  * column drop files min/max ranges cannot — the high-cardinality
  * UNSORTED column case (every file's range spans the whole domain, so
  * range stats keep everything; the parquet footer blooms say
  * "definitely not here" per file).
  */
class LakeBloomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s.metrics("numFiles").value
    }.sum
  }

  /** 8 files; emails hash-scattered so every file's [min, max] spans
    * ~the whole domain — range stats can prove nothing for an equality
    * probe.
    */
  private def unsortedTable() = {
    val cat = new LakeCatalog(spark, Files.createTempDirectory("bloom-spec-").toString)
    val df = spark.range(0, 4000)
      .select($"id", concat(lit("user"), $"id", lit("@example.com")).as("email"),
        ($"id" % 97).cast("double").as("v"))
      .repartition(8) // hash-scatter: unsorted, overlapping ranges
    cat.write(df, "ns.u", WriteMode.Overwrite,
      statsBy = Seq("email"), bloomBy = Seq("email"))
    cat.table("ns.u")
  }

  test("equality probe on an unsorted high-cardinality column skips files ranges cannot") {
    val t = unsortedTable()
    // range stats alone keep all 8 files (every range straddles the probe)
    val probe = "user2024@example.com"
    val got = t.scan(Seq(LakePredicate.EqualTo("email", probe)))
    assert(scannedFiles(got) === 1L, "bloom must narrow the scan to the owning file")
    assert(got.select($"id").as[Long].head() === 2024L)
    // absent value: every file's bloom says definitely-not-here
    val none = t.scan(Seq(LakePredicate.EqualTo("email", "ghost@example.com")))
    assert(scannedFiles(none) === 0L)
    assert(none.count() === 0L)
  }

  test("IN probes keep a file when ANY value may be present; appends inherit blooms") {
    val t = unsortedTable()
    t.write(spark.range(4000, 4500)
      .select($"id", concat(lit("user"), $"id", lit("@example.com")).as("email"),
        ($"id" % 97).cast("double").as("v")).repartition(2),
      WriteMode.Append) // inherits bloomCols: new files carry blooms too
    val got = t.scan(Seq(LakePredicate.In("email",
      Seq("user10@example.com", "user4100@example.com"))))
    assert(got.select($"id").as[Long].collect().sorted === Array(10L, 4100L))
    assert(scannedFiles(got) <= 2L, "one owning file per probed value")
  }

  test("bloom pruning stays conservative: bloom-less files and non-bloom columns untouched") {
    val cat = new LakeCatalog(spark, Files.createTempDirectory("bloom-cons-").toString)
    val df = spark.range(0, 100)
      .select($"id", concat(lit("u"), $"id").as("email"))
    cat.write(df.repartition(4), "ns.plain", WriteMode.Overwrite) // no blooms declared
    val t = cat.table("ns.plain")
    val got = t.scan(Seq(LakePredicate.EqualTo("email", "u42")))
    assert(got.select($"id").as[Long].collect() === Array(42L)) // correct, just unpruned
    // declaring blooms later re-arms skipping from the next write on
    t.write(df.repartition(4), WriteMode.Overwrite, bloomBy = Seq("email"))
    val pruned = t.scan(Seq(LakePredicate.EqualTo("email", "u42")))
    assert(pruned.select($"id").as[Long].collect() === Array(42L))
    assert(scannedFiles(pruned) === 1L)
  }

  test("copy-on-write DML rewrite keeps the bloom contract armed") {
    val t = unsortedTable()
    LakeDml.update(t, $"v" >= 0.0, Map("v" -> ($"v" + 1.0))) // bulk COW rewrite
    val got = t.scan(Seq(LakePredicate.EqualTo("email", "user2024@example.com")))
    assert(got.select($"id").as[Long].head() === 2024L)
    val total = t.latest.get.dirs.map(d =>
      t.io.countFiles(t.loc(d), ".parquet")).sum
    assert(scannedFiles(got) < total, "rewrite must re-enable blooms via inheritance")
  }
}
