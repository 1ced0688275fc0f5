package graft.props

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.lake.{DmlStrategy, IncrementalView, LakeCatalog, LakeDml, WriteMode}
import IncrementalView.{Avg, GroupCount, Max, Min, Sum}

/** Property: an incrementally-maintained view equals the direct
  * aggregate of the source's current state after ANY generated
  * sequence of appends, MOR deletes, keyed upserts, and overwrites —
  * with refreshes interleaved at random points (so one refresh may
  * fold several commits, including mixed kinds).
  */
class IncrementalViewPropSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def forAllSampled[T](g: Gen[T], n: Int)(body: T => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(1337L + i)).foreach(body)
    }

  // ops over rows (g: group key incl. null, id: upsert key, v: value incl. null)
  private sealed trait Op
  private case class Append(rows: List[(Option[String], Long, Option[Double])]) extends Op
  private case class DeleteGroup(g: Option[String]) extends Op
  private case class DeleteIdsBelow(id: Long) extends Op
  private case class Upsert(rows: List[(Option[String], Long, Option[Double])]) extends Op
  private case object OverwriteAll extends Op
  private case object Refresh extends Op

  private val groups = List(Some("a"), Some("b"), Some("c"), None)
  private var nextId = 0L
  private def rowGen: Gen[(Option[String], Long, Option[Double])] = for {
    g <- Gen.oneOf(groups)
    v <- Gen.oneOf(Gen.const(None), Gen.chooseNum(-50, 50).map(x => Some(x.toDouble)))
  } yield { nextId += 1; (g, nextId, v) }

  private def rowsGen = Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, rowGen))

  // upserts draw ids from a bounded range so they COLLIDE with live
  // rows (real updates, incl. group moves), not just insert
  private def upsertRowGen: Gen[(Option[String], Long, Option[Double])] = for {
    g <- Gen.oneOf(groups)
    id <- Gen.chooseNum(1L, 40L)
    v <- Gen.oneOf(Gen.const(None), Gen.chooseNum(-50, 50).map(x => Some(x.toDouble)))
  } yield (g, id, v)
  private def upsertRowsGen = Gen.chooseNum(1, 6)
    .flatMap(n => Gen.listOfN(n, upsertRowGen))
    .map(_.groupBy(_._2).map(_._2.head).toList) // upsert source must be key-unique

  private def opGen: Gen[Op] = Gen.frequency(
    5 -> rowsGen.map(Append),
    2 -> Gen.oneOf(groups).map(DeleteGroup),
    2 -> Gen.chooseNum(1, 40).map(n => DeleteIdsBelow(n.toLong)),
    3 -> upsertRowsGen.map(Upsert),
    1 -> Gen.const(OverwriteAll),
    4 -> Gen.const(Refresh))

  private val aggs = Seq(GroupCount("cnt"), Sum(col("v"), "sum_v"),
    Min(col("v"), "min_v"), Max(col("v"), "max_v"), Avg(col("v"), "avg_v"))

  test("view == direct aggregate under random commit/refresh interleavings") {
    forAllSampled(Gen.chooseNum(6, 14).flatMap(n => Gen.listOfN(n, opGen)), 8) { ops =>
      nextId = 0
      val cat = new LakeCatalog(spark,
        Files.createTempDirectory("ivp-spec-").toString)
      cat.write(List((Some("a"), { nextId += 1; nextId }, Some(1.0)))
        .toDF("g", "id", "v"), "ns.src", WriteMode.Overwrite)
      val t = cat.table("ns.src")

      def refreshAndCheck(): Unit = {
        IncrementalView.refresh(cat, "ns.src", "ns.view", Seq("g"), aggs)
        val got = IncrementalView.read(cat, "ns.view")
          .select("g", "cnt", "sum_v", "min_v", "max_v", "avg_v")
          .as[(Option[String], Long, Option[Double], Option[Double], Option[Double], Option[Double])]
          .collect().toSet
        val want = cat.read("ns.src").groupBy("g")
          .agg(count(lit(1)).as("cnt"), sum($"v").as("sum_v"),
            min($"v").as("min_v"), max($"v").as("max_v"), avg($"v").as("avg_v"))
          .as[(Option[String], Long, Option[Double], Option[Double], Option[Double], Option[Double])]
          .collect().toSet
        assert(got === want, s"after ops prefix; history=${t.history.map(_.op)}")
      }

      ops.foreach {
        case Append(rows) if rows.nonEmpty =>
          cat.write(rows.toDF("g", "id", "v"), "ns.src", WriteMode.Append)
        case DeleteGroup(g) =>
          LakeDml.delete(t, g.map(x => $"g" === x).getOrElse($"g".isNull),
            strategy = DmlStrategy.MergeOnRead)
        case DeleteIdsBelow(id) =>
          LakeDml.delete(t, $"id" <= id, strategy = DmlStrategy.MergeOnRead)
        case Upsert(rows) if rows.nonEmpty =>
          t.upsert(rows.toDF("g", "id", "v"), Seq("id"))
        case OverwriteAll =>
          // keep it non-empty so the table never vanishes
          cat.write(List((Some("b"), { nextId += 1; nextId }, Some(2.0)))
            .toDF("g", "id", "v"), "ns.src", WriteMode.Overwrite)
        case Refresh => refreshAndCheck()
        case _ => ()
      }
      refreshAndCheck() // final state always checked
    }
  }
}
