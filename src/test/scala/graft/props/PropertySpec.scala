package graft.props

import java.nio.file.Files
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.ops.{Dedup, TextOps}
import graft.lake.{LakeCatalog, WriteMode}
import graft.pipeline.Medallion
import graft.state.WatermarkStore

/** Property-based invariants (SURVEY.md §5 item 4): dedup idempotence,
  * gold/silver count conservation, watermark split invariance, and
  * Jaccard/MinHash algebraic properties — over generated data, not
  * fixtures.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // scalatestplus isn't in the offline cache; sample Gen directly with
  // a fixed seed so property runs are deterministic
  private def forAllSampled[T](g: Gen[T], n: Int)(body: T => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)).foreach(body)
    }

  private val wordGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta")
  private val docGen = Gen.chooseNum(3, 12).flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))
  private val docsGen = Gen.chooseNum(2, 12).flatMap(n => Gen.listOfN(n, docGen))

  test("dedup idempotence: dedup(dedup(x)) == dedup(x)") {
    forAllSampled(docsGen, 10) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val once = df.select(TextOps.fingerprint($"text").as("fp")).dropDuplicates()
      val twice = once.dropDuplicates()
      assert(once.count() === twice.count())
    }
  }

  test("gold/silver conservation: sum(total_count) == count(silver input)") {
    forAllSampled(docsGen, 10) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val silver = df.dropDuplicates()
      val gold = silver.groupBy($"text").agg(count(lit(1)).as("total_count"))
      assert(gold.agg(coalesce(sum($"total_count"), lit(0L))).head.getLong(0) === silver.count())
    }
  }

  test("jaccard pairs: symmetric inputs, bounded, and >= threshold") {
    forAllSampled(docsGen, 8) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val pairs = Dedup.ngramJaccardPairs(df, n = 2, threshold = 0.3).collect()
      pairs.foreach { r =>
        assert(r.getLong(0) < r.getLong(1))             // canonical orientation
        val j = r.getDouble(2)
        assert(j >= 0.3 && j <= 1.0)
      }
    }
  }

  test("minhash-LSH finds every exact-duplicate text pair (jaccard 1)") {
    forAllSampled(docsGen, 8) { texts =>
      // plant one exact duplicate of each doc
      val all = texts ++ texts
      val df = all.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val found = Dedup.minHashLshPairs(df, threshold = 0.999)
        .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
      // every planted (i, i+n) pair with >=1 shingle must be found
      val shingled = df.select($"doc_id",
          size(TextOps.wordShingles($"text", 3)).as("sz"))
        .as[(Long, Int)].collect().toMap
      texts.indices.foreach { i =>
        if (shingled(i.toLong) > 0)
          assert(found.contains((i.toLong, (i + texts.size).toLong)) ||
                 texts.count(_ == texts(i)) > 1, // identical text elsewhere may pair differently
            s"missing planted dup for doc $i")
      }
    }
  }

  test("watermark split invariance: two-phase extract ≡ one-shot") {
    val rows = (1 to 20).map(i => (i.toLong, new Timestamp(i * 3600L * 1000)))
    val df = rows.toDF("id", "last_updated")
    def runSplit(splitAt: Int): Long = {
      val cat = new LakeCatalog(spark, Files.createTempDirectory("prop-lake-").toString)
      val st = new WatermarkStore(Files.createTempDirectory("prop-state-"))
      val m = new Medallion(spark, cat, st, retryBaseDelayMs = 1)
      m.extractBronze(df.filter($"id" <= splitAt), "last_updated")
      m.extractBronze(df, "last_updated")
      cat.read("bronze.medallion").count()
    }
    Seq(0, 5, 10, 20).foreach { s => assert(runSplit(s) === 20L, s"split at $s") }
  }
}
