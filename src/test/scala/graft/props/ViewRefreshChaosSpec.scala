package graft.props

import java.nio.file.Files
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.TestSpark
import graft.lake._
import graft.lake.IncrementalView.{Avg, GroupCount, Max, Min, Sum}

/** Randomized differential spec for the refresh-tier machinery: for
  * ANY seeded random walk of DML (append / MOR delete / equality-
  * delete upsert / group migration / dim churn / rewrite compaction)
  * and ANY [[DriverTiers]] value, an incremental refresh must equal a
  * full recompute of the view definition — for both view kinds.
  *
  * The tier pool shrinks the caps so tiny walks cross EVERY boundary
  * the production constants only cross at scale: the driver-exact key
  * cap (including 0 — the In tier disabled outright; deltas above it
  * take the bloom + semi-join distributed path) and the bloom
  * file-count gate forced both open and closed. Key
  * regimes cover integral, string, floating (JoinView's driver tier
  * must refuse boxed-equality float keys), binary (ditto), and
  * null-bearing group keys. Values repeat across rows so deletes land
  * both ON and strictly INSIDE group extrema — the extremum-touch
  * fast path's fold and recompute arms both run.
  */
class ViewRefreshChaosSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val tierPool = Seq(
    // everything driver-small is still above this: distributed tiers run
    DriverTiers(driverKeyCap = 5, bloomFileThreshold = 0),
    // driver-exact tier disabled outright
    DriverTiers(driverKeyCap = 0, bloomFileThreshold = 0),
    // tiny driver window with the bloom gate slammed shut
    DriverTiers(driverKeyCap = 4, bloomFileThreshold = 1000000),
    // production policy
    DriverTiers())

  // exactly-representable doubles: the incremental fold's sums stay
  // bit-equal to the direct aggregate's
  private val vPool: Seq[Any] =
    Seq(null, -5.0, 0.0, 0.5, 3.0, 7.0, 7.0, 42.0)

  private def render(df: DataFrame): Set[String] =
    df.collect().map(_.toSeq.map {
      case b: Array[Byte] => java.util.Arrays.toString(b)
      case x => String.valueOf(x)
    }.mkString("|")).toSet

  test("aggregate view: random DML walks — incremental refresh == full recompute") {
    val aggs = Seq(GroupCount("cnt"), Sum(col("v"), "sum_v"),
      Min(col("v"), "min_v"), Max(col("v"), "max_v"), Avg(col("v"), "avg_v"))
    var checks = 0
    for (regime <- Seq("long", "string", "double", "nullable"); walk <- 0 until 2) {
      val rnd = new scala.util.Random(4242 + 100 * walk + regime.hashCode)
      val tiers = tierPool(rnd.nextInt(tierPool.size))
      val cat = new LakeCatalog(spark,
        Files.createTempDirectory(s"iv-chaos-$regime-").toString)
      val gType: DataType = regime match {
        case "double" => DoubleType
        case "long"   => LongType
        case _        => StringType
      }
      val schema = StructType(Seq(StructField("g", gType, nullable = true),
        StructField("id", LongType, nullable = false),
        StructField("v", DoubleType, nullable = true)))
      var nextId = 0L
      def gKey(): Any = regime match {
        case "long"   => rnd.nextInt(12).toLong
        case "string" => "g" + rnd.nextInt(12)
        case "double" => rnd.nextInt(12) * 1.5
        case "nullable" => if (rnd.nextInt(5) == 0) null else "k" + rnd.nextInt(8)
      }
      def rows(n: Int): DataFrame = {
        val rs = (0 until n).map { _ =>
          nextId += 1
          Row(gKey(), nextId, vPool(rnd.nextInt(vPool.size)))
        }
        spark.createDataFrame(rs.asJava, schema)
      }
      def refresh() = IncrementalView.refresh(cat, "ns.src", "ns.view",
        Seq("g"), aggs, tiers = tiers)
      def check(step: String): Unit = {
        val sel = Seq(col("g").cast("string").as("g"), col("cnt"),
          col("sum_v"), col("min_v"), col("max_v"), col("avg_v"))
        val got = render(IncrementalView.read(cat, "ns.view").select(sel: _*))
        val want = render(cat.read("ns.src").groupBy("g")
          .agg(count(lit(1)).as("cnt"), sum("v").as("sum_v"),
            min("v").as("min_v"), max("v").as("max_v"), avg("v").as("avg_v"))
          .select(sel: _*))
        assert(got === want, s"regime=$regime walk=$walk tiers=$tiers step=$step")
        checks += 1
      }

      cat.write(rows(1 + rnd.nextInt(20)), "ns.src", WriteMode.Overwrite)
      refresh(); check("initial")
      val t = cat.table("ns.src")
      for (step <- 0 until 10) {
        val op = rnd.nextInt(8) match {
          case 0 | 1 =>
            cat.write(rows(1 + rnd.nextInt(20)), "ns.src", WriteMode.Append); "append"
          case 2 =>
            val m = 2 + rnd.nextInt(4)
            LakeDml.delete(t, col("id") % m === rnd.nextInt(m),
              strategy = DmlStrategy.MergeOnRead); "mor-delete-id"
          case 3 =>
            // value-targeted delete: lands ON an extremum often (pool
            // repeats 7.0), strictly inside it often too
            val tgt = vPool(1 + rnd.nextInt(vPool.size - 1))
            LakeDml.delete(t, col("v") === lit(tgt),
              strategy = DmlStrategy.MergeOnRead); "mor-delete-v"
          case 4 =>
            LakeDml.delete(t, col("v").isNull,
              strategy = DmlStrategy.MergeOnRead); "mor-delete-null-v"
          case 5 | 6 =>
            // upsert existing ids with fresh groups/values: equality
            // delete + insert in ONE commit, including group migration
            val hit = 1 + rnd.nextInt(math.max(1, nextId.toInt))
            val rs = (0 until math.min(8, hit)).map { i =>
              Row(gKey(), (hit - i).toLong, vPool(rnd.nextInt(vPool.size)))
            }
            t.upsert(spark.createDataFrame(rs.asJava, schema), Seq("id")); "upsert"
          case 7 =>
            // rewrite commit: no row-level changelog → the refresh must
            // fall back to a full rebuild, not wedge or corrupt
            t.compact(targetPartitions = 2); "compact"
        }
        refresh(); check(s"$step:$op")
      }
    }
    info(s"$checks differential checks (aggregate view)")
    assert(checks >= 50)
  }

  test("join view: random DML walks — incremental refresh == full recompute") {
    var checks = 0
    for (regime <- Seq("long", "string", "double", "binary"); walk <- 0 until 2) {
      val rnd = new scala.util.Random(7777 + 100 * walk + regime.hashCode)
      val tiers = tierPool(rnd.nextInt(tierPool.size))
      val strategy =
        if (rnd.nextBoolean()) DmlStrategy.MergeOnRead else DmlStrategy.Auto
      val cat = new LakeCatalog(spark,
        Files.createTempDirectory(s"jv-chaos-$regime-").toString)
      val idType: DataType = regime match {
        case "long"   => LongType
        case "string" => StringType
        case "double" => DoubleType
        case "binary" => BinaryType
      }
      val factSchema = StructType(Seq(StructField("id", idType, nullable = false),
        StructField("ck", LongType, nullable = true),
        StructField("amt", DoubleType, nullable = true)))
      val dimSchema = StructType(Seq(StructField("dk", LongType, nullable = false),
        StructField("seg", StringType, nullable = true)))
      var nextId = 0L
      def mkId(i: Long): Any = regime match {
        case "long"   => i
        case "string" => s"id-$i"
        case "double" => i * 0.5
        case "binary" => f"$i%08d".getBytes("UTF-8")
      }
      def ck(): Any = if (rnd.nextInt(6) == 0) null else (rnd.nextInt(10) + 1).toLong
      def factRows(n: Int): DataFrame = {
        val rs = (0 until n).map { _ =>
          nextId += 1
          Row(mkId(nextId), ck(), vPool(1 + rnd.nextInt(vPool.size - 1)))
        }
        spark.createDataFrame(rs.asJava, factSchema)
      }
      def dimRows(ks: Seq[Long]): DataFrame =
        spark.createDataFrame(
          ks.map(k => Row(k, s"seg-$k-${rnd.nextInt(100)}")).asJava, dimSchema)
      def refresh() = JoinView.refreshSql(cat, "ns.fact", "ns.dim", "ns.v",
        factKey = "id", joinKey = "ck", dimKey = "dk", dimCols = Seq("seg"),
        strategy = strategy, tiers = tiers)
      def check(step: String): Unit = {
        val got = render(JoinView.read(cat, "ns.v")
          .select(col("id"), col("ck"), col("amt"), col("seg")))
        val want = render {
          val f = cat.read("ns.fact")
          val d = cat.read("ns.dim")
          f.join(d, f("ck") === d("dk"), "left")
            .select(f("id"), f("ck"), f("amt"), d("seg"))
        }
        assert(got === want, s"regime=$regime walk=$walk tiers=$tiers " +
          s"strategy=$strategy step=$step")
        checks += 1
      }

      cat.write(factRows(1 + rnd.nextInt(15)), "ns.fact", WriteMode.Overwrite)
      cat.write(dimRows(1L to 6L), "ns.dim", WriteMode.Overwrite)
      refresh(); check("initial")
      val ft = cat.table("ns.fact")
      val dt = cat.table("ns.dim")
      for (step <- 0 until 10) {
        val op = rnd.nextInt(8) match {
          case 0 | 1 =>
            ft.write(factRows(1 + rnd.nextInt(15)), WriteMode.Append); "fact-append"
          case 2 =>
            val tgt = vPool(1 + rnd.nextInt(vPool.size - 1))
            LakeDml.delete(ft, col("amt") === lit(tgt),
              strategy = DmlStrategy.MergeOnRead); "fact-mor-delete"
          case 3 if regime != "binary" =>
            // re-key existing fact rows to new dims (re-enrichment);
            // binary ids skip this arm — equality-delete upserts on
            // reference-typed keys are outside this walk's scope
            val hi = math.max(1, nextId.toInt)
            val rs = (0 until math.min(6, hi)).map { i =>
              Row(mkId((hi - i).toLong), ck(), vPool(1 + rnd.nextInt(vPool.size - 1)))
            }
            ft.upsert(spark.createDataFrame(rs.asJava, factSchema), Seq("id"))
            "fact-upsert"
          case 3 =>
            LakeDml.delete(ft, col("ck") === (1 + rnd.nextInt(10)).toLong,
              strategy = DmlStrategy.MergeOnRead); "fact-mor-delete-ck"
          case 4 | 5 =>
            // dim upsert: fans out to every fact row holding the key
            dt.upsert(dimRows((0 until 1 + rnd.nextInt(3))
              .map(_ => (rnd.nextInt(10) + 1).toLong).distinct), Seq("dk"))
            "dim-upsert"
          case 6 =>
            LakeDml.delete(dt, col("dk") === (1 + rnd.nextInt(10)).toLong,
              strategy = DmlStrategy.MergeOnRead); "dim-mor-delete"
          case 7 =>
            ft.compact(targetPartitions = 2); "fact-compact"
        }
        refresh(); check(s"$step:$op")
      }
    }
    info(s"$checks differential checks (join view)")
    assert(checks >= 50)
  }
}
