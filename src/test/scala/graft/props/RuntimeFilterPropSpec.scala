package graft.props

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.lake.{LakeCatalog, RuntimeFilter, WriteMode}

/** Property: `RuntimeFilter.prunedJoin` equals the plain inner join
  * for ANY generated fact/dim contents and ANY cap — whichever tier
  * fires (empty short-circuit, In pushdown, range+bloom summary, or
  * the plain fallback). Inputs include null keys on both sides,
  * duplicate dim keys (fan-out), keys with no match either way, and
  * caps small enough to force the over-cap tiers on tiny data.
  */
class RuntimeFilterPropSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def forAllSampled[T](g: Gen[T], n: Int)(body: T => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(7777L + i)).foreach(body)
    }

  private val keyGen: Gen[Option[Long]] = Gen.frequency(
    8 -> Gen.chooseNum(0L, 60L).map(Some(_)),
    1 -> Gen.const(None))

  private case class Fixture(fact: List[(Long, Option[Long], Double)],
                             dim: List[(Option[Long], String)],
                             cap: Int)

  private val fixtureGen: Gen[Fixture] = for {
    nf <- Gen.chooseNum(0, 120)
    fact <- Gen.listOfN(nf, keyGen.map(k => k))
    nd <- Gen.chooseNum(0, 40)
    dim <- Gen.listOfN(nd, for {
      k <- keyGen
      t <- Gen.alphaLowerStr.map(_.take(2))
    } yield (k, t))
    cap <- Gen.oneOf(2, 5, 1000)
  } yield Fixture(
    fact.zipWithIndex.map { case (k, i) => (i.toLong, k, i * 1.5) },
    dim, cap)

  test("prunedJoin == plain inner join across random inputs and caps") {
    forAllSampled(fixtureGen, 12) { fx =>
      val cat = new LakeCatalog(spark,
        Files.createTempDirectory("rfp-spec-").toString)
      val factDf =
        if (fx.fact.isEmpty) List((-1L, Option(0L), 0.0)).toDF("id", "k", "v")
        else fx.fact.toDF("id", "k", "v")
      cat.write(factDf, "ns.fact", WriteMode.Overwrite,
        partitionBy = Seq("bucket(4, k)"), statsBy = Seq("k"))
      val t = cat.table("ns.fact")
      val dim =
        if (fx.dim.isEmpty) Seq.empty[(Option[Long], String)].toDF("dk", "tag")
        else fx.dim.toDF("dk", "tag")
      def render(df: org.apache.spark.sql.DataFrame): List[String] =
        df.select($"id", $"dk", $"tag")
          .collect().map(r => s"${r.getLong(0)}|${r.get(1)}|${r.getString(2)}")
          .toList.sorted
      val pruned = render(RuntimeFilter.prunedJoin(t, "k", dim, "dk", cap = fx.cap))
      val plain = render(t.read(None).join(dim, col("k") === col("dk")))
      assert(pruned === plain,
        s"cap=${fx.cap} nf=${fx.fact.size} nd=${fx.dim.size}")
    }
  }
}
