package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.lake.LakeCatalog

class StreamingLakeSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("stream drains into lake snapshots; restart appends only new batches") {
    val cat = new LakeCatalog(spark, Files.createTempDirectory("slake-").toString)
    val checkpoint = Files.createTempDirectory("slake-ckpt-").toString

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = "/root/testdata/sf0.001/events.parquet"
    val schema = spark.read.parquet(path).schema
    val dir = Files.createTempDirectory("slake-src-")
    Files.createSymbolicLink(dir.resolve("events.parquet"),
      java.nio.file.Paths.get(path))

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(dir.toString)
      val q = StreamingLakeSink.appendStream(stream, cat, "bronze.events", checkpoint)
      q.awaitTermination()
    }
    runOnce()
    val n1 = cat.read("bronze.events").count()
    assert(n1 === spark.read.parquet(path).count())

    // restart with the same checkpoint: no new files → no new rows
    runOnce()
    assert(cat.read("bronze.events").count() === n1)
    assert(cat.read("bronze.events").columns.contains("_batch_id"))
  }
}
