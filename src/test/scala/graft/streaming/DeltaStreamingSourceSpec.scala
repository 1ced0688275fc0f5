package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark
import graft.lake.{DeltaExport, LakePredicate}

/** Streaming over a Delta transaction log ([[DeltaStreamingSource]]):
  * versions are offsets, micro-batches deliver dataChange adds with
  * partition values re-injected, checkpointed restarts resume from the
  * logged version, and data-rewriting commits fail loud unless
  * explicitly skipped — the `readStream.format("delta")` contract
  * with no Delta runtime on the classpath.
  */
class DeltaStreamingSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshLoc(): String =
    Files.createTempDirectory("delta-stream-").toString

  /** Drain to a parquet sink (memory sinks cannot recover from a
    * checkpoint, and restart semantics are exactly what's under test).
    */
  private def drain(loc: String, out: String, checkpoint: String,
                    options: Map[String, String] = Map.empty): Unit = {
    val reader = spark.readStream.format(classOf[DeltaStreamSourceProvider].getName)
      .option("path", loc)
    val q = options.foldLeft(reader) { case (r, (k, v)) => r.option(k, v) }
      .load()
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    q.stop()
  }

  test("appends stream as micro-batches; restart resumes from the checkpoint") {
    val loc = freshLoc()
    val cp = Files.createTempDirectory("delta-stream-cp-").toString
    val out = Files.createTempDirectory("delta-stream-out-").toString
    val exp = new DeltaExport(spark, loc)
    exp.append((1 to 10).map(i => (i.toLong, s"p${i % 2}")).toDF("id", "part"),
      partitionBy = Seq("part"))
    exp.append(Seq((11L, "p1")).toDF("id", "part"))
    drain(loc, out, cp)
    val first = spark.read.parquet(out)
    assert(first.count() === 11L)
    // partition column re-injected, never null
    assert(first.where($"part".isNull).count() === 0L)
    assert(first.where($"part" === "p1").count() === 6L)
    // restart with the same checkpoint: only NEW commits deliver
    exp.append(Seq((12L, "p0")).toDF("id", "part"))
    drain(loc, out, cp)
    val second = spark.read.parquet(out)
    assert(second.count() === 12L)
    assert(second.where($"id" === 12L).count() === 1L)
  }

  test("a data-rewriting commit fails loud; skipChangeCommits passes over it") {
    val loc = freshLoc()
    val exp = new DeltaExport(spark, loc)
    exp.append((1 to 10).map(i => (i.toLong, s"p${i % 2}")).toDF("id", "part"),
      partitionBy = Seq("part"))
    exp.deleteWhere(Seq(LakePredicate.EqualTo("part", "p1")))
    exp.append(Seq((11L, "p0")).toDF("id", "part"))
    val cp1 = Files.createTempDirectory("delta-stream-cp-").toString
    val out1 = Files.createTempDirectory("delta-stream-out-").toString
    val ex = intercept[Exception] {
      drain(loc, out1, cp1)
    }
    def chain(e: Throwable): Seq[String] =
      if (e == null) Nil else Option(e.getMessage).toSeq ++ chain(e.getCause)
    assert(chain(ex).exists(_.contains("rewrites data")))
    // with skipChangeCommits the delete commit is skipped, appends flow
    val cp2 = Files.createTempDirectory("delta-stream-cp-").toString
    val out2 = Files.createTempDirectory("delta-stream-out-").toString
    drain(loc, out2, cp2, Map("skipChangeCommits" -> "true"))
    assert(spark.read.parquet(out2).count() === 11L)
  }

  test("startingVersion seeds a fresh stream past early history") {
    val loc = freshLoc()
    val exp = new DeltaExport(spark, loc)
    exp.append(Seq((1L, "a")).toDF("id", "name")) // v0
    exp.append(Seq((2L, "b")).toDF("id", "name")) // v1
    exp.append(Seq((3L, "c")).toDF("id", "name")) // v2
    val cp = Files.createTempDirectory("delta-stream-cp-").toString
    val out = Files.createTempDirectory("delta-stream-out-").toString
    drain(loc, out, cp, Map("startingVersion" -> "2"))
    assert(spark.read.parquet(out).select($"id").as[Long].collect().toSeq === Seq(3L))
  }

  test("maxVersionsPerTrigger bounds each micro-batch") {
    val loc = freshLoc()
    val exp = new DeltaExport(spark, loc)
    for (i <- 1 to 4) exp.append(Seq((i.toLong, s"n$i")).toDF("id", "name"))
    // a V1 source without AvailableNow support runs single-batch under
    // that trigger; cap semantics need the ProcessingTime drain loop
    val q = spark.readStream.format(classOf[DeltaStreamSourceProvider].getName)
      .option("path", loc).option("maxVersionsPerTrigger", "1")
      .load()
      .writeStream.format("memory").queryName("ds_cap")
      .trigger(Trigger.ProcessingTime(0)).start()
    q.processAllAvailable()
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    q.stop()
    assert(spark.table("ds_cap").count() === 4L)
    assert(batches.length === 4, s"expected 4 bounded batches, got ${batches.length}")
  }
}
