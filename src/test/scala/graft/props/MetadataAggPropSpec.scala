package graft.props

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.lake.{DmlStrategy, LakeCatalog, LakeDml, WriteMode}

/** Properties of the metadata aggregates under ANY generated sequence
  * of appends, MOR deletes, keyed upserts, overwrites, and compacts:
  *
  *  - SOUND: whenever `metadataRowCount`/`metadataBounds` answer,
  *    the answer equals the scan's (count / true numeric min-max).
  *  - COMPLETE for counts: on a delete-free snapshot the count fast
  *    path must be armed — None is only ever the delete fence.
  */
class MetadataAggPropSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def forAllSampled[T](g: Gen[T], n: Int)(body: T => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(4242L + i)).foreach(body)
    }

  private sealed trait Op
  private case class Append(rows: List[(Long, Option[Double])]) extends Op
  private case class DeleteBelow(id: Long) extends Op
  private case class Upsert(rows: List[(Long, Option[Double])]) extends Op
  private case object OverwriteAll extends Op
  private case object Compact extends Op

  private var nextId = 0L
  private def rowGen: Gen[(Long, Option[Double])] =
    Gen.oneOf(Gen.const(None), Gen.chooseNum(-90, 90).map(x => Some(x.toDouble)))
      .map { v => nextId += 1; (nextId, v) }
  private def upsertRowGen: Gen[(Long, Option[Double])] = for {
    id <- Gen.chooseNum(1L, 40L)
    v <- Gen.oneOf(Gen.const(None), Gen.chooseNum(-90, 90).map(x => Some(x.toDouble)))
  } yield (id, v)

  private def opGen: Gen[Op] = Gen.frequency(
    5 -> Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, rowGen)).map(Append),
    2 -> Gen.chooseNum(1, 40).map(n => DeleteBelow(n.toLong)),
    2 -> Gen.chooseNum(1, 5).flatMap(n => Gen.listOfN(n, upsertRowGen))
      .map(rs => Upsert(rs.groupBy(_._1).map(_._2.head).toList)),
    1 -> Gen.const(OverwriteAll),
    2 -> Gen.const(Compact))

  test("metadata count/bounds: sound always, count complete when delete-free") {
    forAllSampled(Gen.chooseNum(5, 12).flatMap(n => Gen.listOfN(n, opGen)), 8) { ops =>
      nextId = 100L
      val cat = new LakeCatalog(spark,
        Files.createTempDirectory("maggp-").toString)
      cat.write(List((1L, Option(5.0)), (2L, Option(-3.0)), (3L, Option.empty[Double]))
        .toDF("id", "v"), "ns.t", WriteMode.Overwrite, statsBy = Seq("id", "v"))
      val t = cat.table("ns.t")

      def check(): Unit = {
        val snap = t.latest.get
        val deleteFree = snap.deleteDirs.isEmpty && snap.eqDeletes.isEmpty
        val rows = t.read().collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        t.metadataRowCount() match {
          case Some(n) => assert(n === rows.length.toLong)
          case None => assert(!deleteFree,
            s"count fast path must be armed on a delete-free snapshot (op=${snap.op})")
        }
        t.metadataBounds("v").foreach { case (lo, hi) =>
          val vs = rows.flatMap(_._2)
          assert(vs.nonEmpty && lo.toDouble === vs.min && hi.toDouble === vs.max,
            s"bounds ($lo,$hi) vs true ${if (vs.isEmpty) "empty" else (vs.min, vs.max)}")
        }
        t.metadataBounds("id").foreach { case (lo, hi) =>
          assert(rows.nonEmpty && lo.toLong === rows.map(_._1).min &&
            hi.toLong === rows.map(_._1).max)
        }
      }

      ops.foreach { op =>
        op match {
          case Append(rows) if rows.nonEmpty =>
            cat.write(rows.toDF("id", "v"), "ns.t", WriteMode.Append)
          case DeleteBelow(id) =>
            LakeDml.delete(t, $"id" <= id, strategy = DmlStrategy.MergeOnRead)
          case Upsert(rows) if rows.nonEmpty =>
            t.upsert(rows.toDF("id", "v"), Seq("id"))
          case OverwriteAll =>
            cat.write(List((0L, Option(1.0))).toDF("id", "v"), "ns.t",
              WriteMode.Overwrite, statsBy = Seq("id", "v"))
          case Compact => t.compact(1)
          case _ => ()
        }
        check()
      }
    }
  }
}
