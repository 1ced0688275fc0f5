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
}
