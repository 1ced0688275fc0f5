package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.ZOrderFunctions.zorder_code

/** Per-dimension monotonicity is THE invariant that makes a Morton
  * code a valid clustering key: with all other dimensions fixed,
  * increasing one dimension must strictly increase the code under
  * Spark's unsigned-lexicographic BinaryType ordering. Checked over
  * seeded random longs (negatives included) and doubles (±0,
  * subnormals, infinities).
  */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ult(a: Array[Byte], b: Array[Byte]): Boolean = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    a.length < b.length
  }

  test("monotone per dimension over random longs (incl. negatives, extremes)") {
    val r = new scala.util.Random(4242)
    val interesting = Seq(Long.MinValue, -1L, 0L, 1L, Long.MaxValue)
    val vals = (interesting ++ Seq.fill(40)(r.nextLong())).distinct.sorted
    val fixed = Seq(Long.MinValue, -7L, 0L, 123456789L, Long.MaxValue)
    val df = (for (v <- vals; f <- fixed) yield (v, f)).toDF("a", "b")
      .select($"a", $"b", zorder_code($"a", $"b").as("zab"), zorder_code($"b", $"a").as("zba"))
    val rows = df.collect().map(row =>
      ((row.getLong(0), row.getLong(1)),
        (row.getAs[Array[Byte]](2), row.getAs[Array[Byte]](3)))).toMap
    for (f <- fixed; w <- vals.sliding(2)) w match {
      case Seq(lo, hi) =>
        assert(ult(rows((lo, f))._1, rows((hi, f))._1), s"dim0 $lo<$hi at fixed $f")
        assert(ult(rows((lo, f))._2, rows((hi, f))._2), s"dim1 $lo<$hi at fixed $f")
      case _ =>
    }
  }

  test("monotone per dimension over doubles (±0, subnormal, infinities)") {
    val vals = Seq(Double.NegativeInfinity, -1e300, -1.5, -Double.MinPositiveValue,
      -0.0, 0.0, Double.MinPositiveValue, 1.5, 1e300, Double.PositiveInfinity)
    val df = vals.map(v => (v, 1.0)).toDF("a", "b")
      .select($"a", zorder_code($"a", $"b").as("z"))
    val codes = df.collect().map(r => r.getDouble(0) -> r.getAs[Array[Byte]](1)).toMap
    // strictly increasing, except -0.0 ≡ 0.0: Spark's UnsafeRow writer
    // normalizes -0.0 to +0.0 (SPARK-32110), so the two produce
    // IDENTICAL codes — consistent with Spark's own sort/group
    // semantics for signed zero
    vals.sliding(2).foreach {
      case Seq(-0.0, 0.0) =>
        assert(java.util.Arrays.equals(codes(-0.0), codes(0.0)), "-0.0 ≡ 0.0")
      case Seq(lo, hi) => assert(ult(codes(lo), codes(hi)), s"$lo < $hi")
      case _ =>
    }
  }

  test("string dimension rejected at analysis time, not per-row in tasks") {
    val err = intercept[Exception] {
      Seq((1L, "a")).toDF("a", "b").select(zorder_code($"a", $"b")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("zorder_code")
      || err.toString.contains("DATATYPE_MISMATCH"), err.toString)
    // and it must fail BEFORE execution — AnalysisException, not a task failure
    assert(err.isInstanceOf[org.apache.spark.sql.AnalysisException]
      || err.getClass.getName.contains("Analysis"), err.getClass.toString)
  }

  test("date and timestamp dimensions interleave monotonically") {
    val df = Seq(
      ("2023-12-31", "2024-01-01 00:00:00"),
      ("2024-01-01", "2024-01-01 00:00:01"),
      ("2024-06-15", "2024-03-01 12:00:00"),
      ("2025-01-01", "2024-12-31 23:59:59"))
      .toDF("d", "t")
      .select(to_date($"d").as("d"), to_timestamp($"t").as("t"))
    val codes = df.select(zorder_code($"d", $"t").as("z"))
      .collect().map(_.getAs[Array[Byte]](0))
    // rows are simultaneously increasing in both dims → strict code order
    codes.sliding(2).foreach {
      case Array(a, b) => assert(ult(a, b))
      case _ =>
    }
    assert(codes.head.length === 16)
  }

  test("null in any dimension yields null; 3-column codes are 24 bytes") {
    val df = Seq((Option(1L), Option(2L)), (None, Option(2L)))
      .toDF("a", "b")
      .select(zorder_code($"a", $"b", lit(7L)).as("z"))
    val rows = df.collect()
    assert(rows(0).getAs[Array[Byte]](0).length === 24)
    assert(rows(1).isNullAt(0))
  }
}
