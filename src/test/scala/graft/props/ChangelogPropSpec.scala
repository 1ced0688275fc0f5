package graft.props

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.lake.{DmlStrategy, LakeCatalog, LakeDml, WriteMode}

/** THE changelog contract, as a property: for ANY generated sequence
  * of appends, keyed upserts, MOR deletes, and bin-pack compactions,
  * and ANY committed version pair i < j, applying the changelog to the
  * older snapshot reproduces the newer one exactly:
  *
  *   read@i  ∖  deletes(i,j]  ⊎  inserts(i,j]  ==  read@j   (multisets)
  *
  * Every incremental consumer in the repo — IncrementalView, JoinView,
  * the CDF stream, incremental dedup — assumes exactly this identity;
  * here it is checked directly against randomized histories, including
  * ranges that span compactions (which must contribute NOTHING to the
  * changelog while changing the file layout underneath).
  */
class ChangelogPropSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def forAllSampled[T](g: Gen[T], n: Int)(body: T => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(9091L + i)).foreach(body)
    }

  private sealed trait Op
  private case class Append(rows: List[(Long, String, Double)]) extends Op
  private case class Upsert(rows: List[(Long, String, Double)]) extends Op
  private case class DeleteWhere(g: String) extends Op
  private case class DeleteBelow(id: Long) extends Op
  private case object Compact extends Op

  private val groups = List("a", "b", "c")
  private var nextId = 0L
  private def rowGen: Gen[(Long, String, Double)] = for {
    g <- Gen.oneOf(groups)
    v <- Gen.chooseNum(-40, 40)
  } yield { nextId += 1; (nextId, g, v.toDouble) }

  // upsert ids collide with live rows (updates) and with each other
  // pre-dedup; the source frame must be key-unique
  private def upsertRowGen: Gen[(Long, String, Double)] = for {
    id <- Gen.chooseNum(1L, 25L)
    g <- Gen.oneOf(groups)
    v <- Gen.chooseNum(-40, 40)
  } yield (id, g, v.toDouble)

  private def opGen: Gen[Op] = Gen.frequency(
    5 -> Gen.chooseNum(1, 5).flatMap(n => Gen.listOfN(n, rowGen)).map(Append),
    3 -> Gen.chooseNum(1, 5).flatMap(n => Gen.listOfN(n, upsertRowGen))
      .map(_.groupBy(_._1).map(_._2.head).toList).map(Upsert),
    2 -> Gen.oneOf(groups).map(DeleteWhere),
    2 -> Gen.chooseNum(1L, 60L).map(DeleteBelow),
    2 -> Gen.const(Compact))

  private type R = (Long, String, Double)
  private def multiset(rows: Seq[R]): Map[R, Int] =
    rows.groupBy(identity).view.mapValues(_.size).toMap

  test("snapshot(i) + changes(i, j] == snapshot(j) for random histories and ranges") {
    forAllSampled(Gen.chooseNum(5, 10).flatMap(n => Gen.listOfN(n, opGen)), 6) { ops =>
      nextId = 30 // appends never collide with the 1..25 upsert range
      val cat = new LakeCatalog(spark,
        Files.createTempDirectory("chlog-spec-").toString)
      cat.write(List((26L, "a", 1.0), (27L, "b", 2.0))
        .toDF("id", "g", "v"), "ns.t", WriteMode.Overwrite)
      val t = cat.table("ns.t")

      ops.foreach {
        case Append(rows) if rows.nonEmpty =>
          t.write(rows.toDF("id", "g", "v"), WriteMode.Append)
        case Upsert(rows) if rows.nonEmpty =>
          t.upsert(rows.toDF("id", "g", "v"), Seq("id"))
        case DeleteWhere(g) =>
          LakeDml.delete(t, $"g" === g, strategy = DmlStrategy.MergeOnRead)
        case DeleteBelow(id) =>
          LakeDml.delete(t, $"id" <= id, strategy = DmlStrategy.MergeOnRead)
        case Compact =>
          t.compactBinPack(maxDirBytes = 1L << 30)
        case _ => ()
      }

      val latest = t.latest.get.version
      // every adjacent pair plus the full span and a couple of strides
      val pairs = (1L until latest).map(i => (i, i + 1L)) ++
        Seq((1L, latest)) ++ (1L until latest by 3).map(i => (i, latest))
      pairs.distinct.foreach { case (vi, vj) =>
        val base = multiset(t.read(Some(vi)).as[R].collect().toSeq)
        val ch = t.readChanges(vi, Some(vj))
          .select($"id", $"g", $"v", $"_change_type").collect()
        val ins = multiset(ch.filter(_.getString(3) == "insert")
          .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq)
        val del = multiset(ch.filter(_.getString(3) == "delete")
          .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq)
        val applied = (base.keySet ++ ins.keySet).flatMap { k =>
          val n = base.getOrElse(k, 0) - del.getOrElse(k, 0) + ins.getOrElse(k, 0)
          assert(n >= 0, s"changelog deleted more '$k' than existed at v$vi→v$vj")
          if (n > 0) Some(k -> n) else None
        }.toMap
        val want = multiset(t.read(Some(vj)).as[R].collect().toSeq)
        assert(applied === want,
          s"apply(v$vi, changes(v$vi, v$vj]) != read@v$vj; history=${t.history.map(_.op)}")
      }
    }
  }
}
