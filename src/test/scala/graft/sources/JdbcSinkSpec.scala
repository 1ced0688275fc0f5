package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** JDBC warehouse sink: atomic staged swap must be idempotent, must
  * recover from orphaned staging tables (a failed prior run), and must
  * leave no staging residue after publish.
  */
class JdbcSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val driver = DerbyMem.driver

  private def withDb(f: String => Unit): Unit = DerbyMem.withDb("sink")(f)

  private def readBack(url: String): Map[String, Long] =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", "APP.GOLD").option("driver", driver)
      .load().collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("replace is a full swap: second publish fully supersedes the first") {
    withDb { url =>
      JdbcSink.replace(Seq(("a", 1L), ("b", 2L)).toDF("k", "n").coalesce(1),
        url, "APP.GOLD", driver)
      assert(readBack(url) == Map("a" -> 1L, "b" -> 2L))
      JdbcSink.replace(Seq(("c", 9L)).toDF("k", "n").coalesce(1),
        url, "APP.GOLD", driver)
      assert(readBack(url) == Map("c" -> 9L))
    }
  }

  test("orphan staging table from a failed run does not block the next publish") {
    withDb { url =>
      val conn = java.sql.DriverManager.getConnection(url)
      conn.createStatement().execute(
        "CREATE TABLE APP.GOLD_STG (junk INT)") // dead prior attempt
      conn.close()
      JdbcSink.replace(Seq(("a", 1L)).toDF("k", "n").coalesce(1),
        url, "APP.GOLD", driver)
      assert(readBack(url) == Map("a" -> 1L))
      // staging renamed away — no residue
      val c2 = java.sql.DriverManager.getConnection(url)
      val rs = c2.getMetaData.getTables(null, "APP", "GOLD_STG", Array("TABLE"))
      try assert(!rs.next(), "staging table must not survive a publish")
      finally { rs.close(); c2.close() }
    }
  }

  test("streaming publish: per-epoch atomic swaps, exactly-once under replay") {
    import org.apache.spark.sql.functions._
    withDb { url =>
      val dir = java.nio.file.Files.createTempDirectory("sinkstream").toString
      val ckpt = java.nio.file.Files.createTempDirectory("sinkstream-ck").toString
      // three files → three AvailableNow epochs at maxFilesPerTrigger=1
      Seq(("a", 1L)).toDF("k", "v").coalesce(1).write.parquet(s"$dir/f1")
      Seq(("a", 2L), ("b", 5L)).toDF("k", "v").coalesce(1).write.parquet(s"$dir/f2")
      Seq(("b", 7L)).toDF("k", "v").coalesce(1).write.parquet(s"$dir/f3")
      val sch = spark.read.parquet(s"$dir/f1").schema
      val agg = spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true").parquet(dir)
        .groupBy($"k").agg(sum($"v").as("n"))
      val q = JdbcSink.replaceStream(agg.coalesce(1), url, "APP.GOLD", driver, ckpt)
      q.awaitTermination()
      // complete-mode epochs: the last publish is the FULL aggregate
      assert(readBack(url) == Map("a" -> 3L, "b" -> 12L))

      // replay of a committed epoch (the at-least-once failure mode)
      // must be a no-op even with different payload
      val replayed = JdbcSink.replaceEpoch(
        Seq(("junk", -1L)).toDF("k", "n").coalesce(1), url, "APP.GOLD", driver,
        batchId = 0L)
      assert(!replayed)
      assert(readBack(url) == Map("a" -> 3L, "b" -> 12L))
      // a FRESH epoch still publishes
      assert(JdbcSink.replaceEpoch(
        Seq(("z", 1L)).toDF("k", "n").coalesce(1), url, "APP.GOLD", driver,
        batchId = 999L))
      assert(readBack(url) == Map("z" -> 1L))
    }
  }

  test("ClickHouse dialect renders EXCHANGE TABLES; Ansi stays transactional") {
    import JdbcSink.{SwapDialect, SwapPlan}
    // steady state: atomic exchange, then drop the swapped-out staging
    assert(SwapDialect.ClickHouse.swapPlan(
      "gold.daily", "daily", "gold.daily_STG", liveExists = true) ===
      SwapPlan(Seq(
        "EXCHANGE TABLES gold.daily_STG AND gold.daily",
        "DROP TABLE IF EXISTS gold.daily_STG"), transactional = false))
    // first publish: no live table to exchange with — atomic RENAME,
    // QUALIFIED target (ClickHouse renames across databases by name)
    assert(SwapDialect.ClickHouse.swapPlan(
      "gold.daily", "daily", "gold.daily_STG", liveExists = false) ===
      SwapPlan(Seq("RENAME TABLE gold.daily_STG TO gold.daily"),
        transactional = false))
    // the Derby-proven shape is unchanged by the dialect refactor:
    // transactional DROP+RENAME with the BARE rename target
    assert(SwapDialect.Ansi.swapPlan(
      "APP.GOLD", "GOLD", "APP.GOLD_STG", liveExists = true) ===
      SwapPlan(Seq("DROP TABLE APP.GOLD", "RENAME TABLE APP.GOLD_STG TO GOLD"),
        transactional = true))
    assert(SwapDialect.Ansi.swapPlan(
      "APP.GOLD", "GOLD", "APP.GOLD_STG", liveExists = false) ===
      SwapPlan(Seq("RENAME TABLE APP.GOLD_STG TO GOLD"), transactional = true))
  }

  test("replace through an explicit dialect still runs e2e against Derby") {
    import JdbcSink.SwapDialect
    withDb { url =>
      JdbcSink.replace(Seq(("a", 1L)).toDF("k", "n").coalesce(1),
        url, "APP.GOLD", driver, dialect = SwapDialect.Ansi)
      JdbcSink.replace(Seq(("b", 2L)).toDF("k", "n").coalesce(1),
        url, "APP.GOLD", driver, dialect = SwapDialect.Ansi)
      assert(readBack(url) == Map("b" -> 2L))
    }
  }
}
