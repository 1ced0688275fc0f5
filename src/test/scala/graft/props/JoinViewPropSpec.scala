package graft.props

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.lake.{DmlStrategy, JoinView, LakeCatalog, LakeDml, WriteMode}

/** Property: an incrementally-maintained JOIN view equals the direct
  * `fact LEFT JOIN dim` of both sources' CURRENT state after ANY
  * generated sequence of fact appends/upserts/deletes, dim
  * upserts/deletes, and occasional fact overwrites (the loud
  * full-rebuild path) — with refreshes interleaved at random points,
  * so one refresh may fold several commits on BOTH changelogs at
  * once (the dual-cursor path, including dim-change fan-out and the
  * In/bloom bounded fact re-read).
  */
class JoinViewPropSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def forAllSampled[T](g: Gen[T], n: Int)(body: T => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(4242L + i)).foreach(body)
    }

  private sealed trait Op
  private case class FactAppend(rows: List[(Long, Option[Long], Double)]) extends Op
  private case class FactUpsert(rows: List[(Long, Option[Long], Double)]) extends Op
  private case class FactDeleteBelow(id: Long) extends Op
  private case object FactOverwrite extends Op
  private case class DimUpsert(rows: List[(Long, String)]) extends Op
  private case class DimDelete(ck: Long) extends Op
  private case object Refresh extends Op

  // small join-key domain forces fan-out (many fact rows per dim key)
  // and real collisions; None exercises the LEFT-JOIN null arm
  private val cks: List[Option[Long]] =
    List(Some(1L), Some(2L), Some(3L), Some(4L), None)
  private var nextId = 0L
  private def factRowGen: Gen[(Long, Option[Long], Double)] = for {
    ck <- Gen.oneOf(cks)
    v <- Gen.chooseNum(-50, 50)
  } yield { nextId += 1; (nextId, ck, v.toDouble) }
  private def factRowsGen = Gen.chooseNum(1, 5).flatMap(n => Gen.listOfN(n, factRowGen))

  // upsert ids live in 1..30, disjoint from append ids (1000+): the
  // fact key is the view's PRIMARY key, so the fixture must never mint
  // the same id twice (the engine rejects ambiguous merges loudly —
  // the first thing this property run proved)
  private def factUpsertRowGen: Gen[(Long, Option[Long], Double)] = for {
    id <- Gen.chooseNum(1L, 30L) // collide with other upserts: real updates
    ck <- Gen.oneOf(cks)
    v <- Gen.chooseNum(-50, 50)
  } yield (id, ck, v.toDouble)
  private def factUpsertRowsGen = Gen.chooseNum(1, 5)
    .flatMap(n => Gen.listOfN(n, factUpsertRowGen))
    .map(_.groupBy(_._1).map(_._2.head).toList)

  private def dimRowGen: Gen[(Long, String)] = for {
    ck <- Gen.chooseNum(1L, 5L) // includes key 5: a dim row no fact may hold
    s <- Gen.alphaLowerStr.map(_.take(3))
  } yield (ck, s)
  private def dimRowsGen = Gen.chooseNum(1, 3)
    .flatMap(n => Gen.listOfN(n, dimRowGen))
    .map(_.groupBy(_._1).map(_._2.head).toList)

  private def opGen: Gen[Op] = Gen.frequency(
    5 -> factRowsGen.map(FactAppend),
    3 -> factUpsertRowsGen.map(FactUpsert),
    2 -> Gen.chooseNum(1L, 1050L).map(FactDeleteBelow),
    1 -> Gen.const(FactOverwrite),
    4 -> dimRowsGen.map(DimUpsert),
    2 -> Gen.chooseNum(1L, 5L).map(DimDelete),
    5 -> Gen.const(Refresh))

  test("join view == direct fact LEFT JOIN dim under random interleavings") {
    forAllSampled(Gen.chooseNum(6, 12).flatMap(n => Gen.listOfN(n, opGen)), 6) { ops =>
      nextId = 1002
      val cat = new LakeCatalog(spark,
        Files.createTempDirectory("jvp-spec-").toString)
      cat.write(List((1001L, Option(1L), 5.0), (1002L, Option.empty[Long], 7.0))
        .toDF("id", "ck", "amt"), "ns.fact", WriteMode.Overwrite)
      cat.write(List((1L, "s1"), (2L, "s2")).toDF("ck", "seg"),
        "ns.dim", WriteMode.Overwrite)
      val fact = cat.table("ns.fact")
      val dim = cat.table("ns.dim")

      def refreshAndCheck(): Unit = {
        JoinView.refreshSql(cat, "ns.fact", "ns.dim", "ns.v",
          "id", "ck", "ck", Seq("seg"))
        val got = JoinView.read(cat, "ns.v")
          .as[(Long, Option[Long], Double, Option[String])].collect().toSet
        val f = cat.read("ns.fact")
        val d = cat.read("ns.dim")
        val want = f.join(d, f("ck") === d("ck"), "left")
          .select(f("id"), f("ck"), f("amt"), d("seg"))
          .as[(Long, Option[Long], Double, Option[String])].collect().toSet
        assert(got === want,
          s"fact history=${fact.history.map(_.op)} dim history=${dim.history.map(_.op)}")
      }

      ops.foreach {
        case FactAppend(rows) if rows.nonEmpty =>
          fact.write(rows.toDF("id", "ck", "amt"), WriteMode.Append)
        case FactUpsert(rows) if rows.nonEmpty =>
          fact.upsert(rows.toDF("id", "ck", "amt"), Seq("id"))
        case FactDeleteBelow(id) =>
          LakeDml.delete(fact, $"id" <= id, strategy = DmlStrategy.MergeOnRead)
        case FactOverwrite =>
          cat.write(List(({ nextId += 1; nextId }, Option(2L), 9.0))
            .toDF("id", "ck", "amt"), "ns.fact", WriteMode.Overwrite)
        case DimUpsert(rows) if rows.nonEmpty =>
          dim.upsert(rows.toDF("ck", "seg"), Seq("ck"))
        case DimDelete(ck) =>
          LakeDml.delete(dim, $"ck" === ck, strategy = DmlStrategy.MergeOnRead)
        case Refresh => refreshAndCheck()
        case _ => ()
      }
      refreshAndCheck() // final state always checked
    }
  }
}
