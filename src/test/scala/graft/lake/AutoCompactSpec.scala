package graft.lake

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Declared auto-compaction: trickle appends self-fold once the
  * small-dir count crosses the policy, the policy survives every
  * commit class, and clearing it stops the folding.
  */
class AutoCompactSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh() = {
    val cat = new LakeCatalog(spark, Files.createTempDirectory("autoc-").toString)
    cat.write(Seq((1L, "seed")).toDF("id", "s"), "ns.t", WriteMode.Overwrite)
    cat.table("ns.t")
  }

  test("trickle appends self-fold at the declared threshold; data intact") {
    val t = fresh()
    t.setAutoCompact(smallDirs = 3, maxDirBytes = 64 * 1024)
    for (i <- 2L to 9L)
      t.write(Seq((i, s"r$i")).toDF("id", "s"), WriteMode.Append)
    // without the policy 9 commits would leave 9 dirs; the policy folds
    // every time 3 small dirs accumulate, so the live set stays bounded
    val dirs = t.latest.get.dirs.size
    assert(dirs < 4, s"expected bounded dir count, got $dirs")
    assert(t.history.exists(_.op == "compact")) // the folds really ran
    assert(t.read(None).select($"id").as[Long].collect().sorted === (1L to 9L).toArray)
    // upsert path triggers it too
    for (i <- 10L to 12L) t.upsert(Seq((i, s"u$i")).toDF("id", "s"), Seq("id"))
    assert(t.latest.get.dirs.size < 4)
    assert(t.read(None).count() === 12L)
  }

  test("policy survives overwrite and clears with smallDirs = 0") {
    val t = fresh()
    t.setAutoCompact(smallDirs = 3, maxDirBytes = 64 * 1024)
    t.write(Seq((1L, "ow")).toDF("id", "s"), WriteMode.Overwrite)
    assert(t.latest.get.meta.contains(FileStats.AutoCompactKey))
    t.setAutoCompact(smallDirs = 0)
    assert(!t.latest.get.meta.contains(FileStats.AutoCompactKey))
    val before = t.latest.get.dirs.size
    for (i <- 2L to 7L) t.write(Seq((i, s"r$i")).toDF("id", "s"), WriteMode.Append)
    assert(t.latest.get.dirs.size === before + 6) // no more folding
  }
}
