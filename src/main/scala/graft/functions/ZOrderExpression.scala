package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Z-order (Morton) code over 2-8 numeric columns — the sort key
  * behind multi-dimensional file clustering (Iceberg's
  * `rewrite_data_files` zorder strategy): sorting by the interleaved
  * code keeps rows close in EVERY dimension close in the file order,
  * so per-file min/max stats stay tight on all participating columns
  * at once, where a lexicographic sort only prunes on its leading
  * column.
  *
  * Each input maps to an order-preserving unsigned 64-bit key
  * (two's-complement flip for integrals; the IEEE-754 total-order
  * transform for doubles), then ALL 64 bits of every key interleave
  * round-robin MSB-first into an n×8-byte BinaryType code (unsigned
  * lexicographic binary ordering = Morton ordering; truncating to a
  * fixed 64-bit output would erase low-bit distinctions — small
  * values would all collide). Fixing all other dimensions, the code
  * is strictly monotonic in the remaining one.
  *
  * Raw bit-interleaving assumes roughly comparable value ranges per
  * dimension; heavily skewed columns should be rank-normalized first
  * (Iceberg samples range boundaries for the same reason). NULL in any
  * dimension yields NULL (sorts together under NULLS FIRST/LAST).
  * CodegenFallback: the expression runs once per row inside a
  * compaction rewrite whose cost is the parquet IO, not this call.
  */
case class ZOrderCode(children: Seq[Expression])
    extends Expression with CodegenFallback {
  require(children.size >= 2 && children.size <= 8,
    s"zorder_code takes 2-8 columns, got ${children.size}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "zorder_code"

  private val supported: Set[DataType] = Set(LongType, IntegerType, ShortType,
    ByteType, DoubleType, FloatType, DateType, TimestampType)

  /** Analysis-time rejection of non-numeric dimensions — without this
    * a zorder over a string column launches the full compaction job
    * and fails per-row inside executor tasks instead of failing the
    * plan up front.
    */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    children.map(_.dataType).find(!supported.contains(_)) match {
      case Some(bad) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"zorder_code: unsupported type $bad (numeric/date/timestamp only)")
      case None => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    }
  }

  private def unsignedKey(v: Any, dt: DataType): Long = dt match {
    case LongType    => v.asInstanceOf[Long] ^ Long.MinValue
    case IntegerType => v.asInstanceOf[Int].toLong ^ Long.MinValue
    case ShortType   => v.asInstanceOf[Short].toLong ^ Long.MinValue
    case ByteType    => v.asInstanceOf[Byte].toLong ^ Long.MinValue
    case DoubleType =>
      val bits = java.lang.Double.doubleToLongBits(v.asInstanceOf[Double])
      (if (bits < 0) ~bits else bits | Long.MinValue) // IEEE total order → unsigned
    case FloatType =>
      val bits = java.lang.Float.floatToIntBits(v.asInstanceOf[Float]).toLong << 32
      (if (bits < 0) ~bits else bits | Long.MinValue)
    case DateType => v.asInstanceOf[Int].toLong ^ Long.MinValue
    case TimestampType => v.asInstanceOf[Long] ^ Long.MinValue
    case other => throw new IllegalArgumentException(
      s"zorder_code: unsupported type $other (numeric/date/timestamp only)")
  }

  override def eval(input: InternalRow): Any = {
    val n = children.size
    val keys = new Array[Long](n)
    var i = 0
    while (i < n) {
      val v = children(i).eval(input)
      if (v == null) return null
      keys(i) = unsignedKey(v, children(i).dataType)
      i += 1
    }
    val out = new Array[Byte](n * 8)
    var pos = 0 // output bit cursor, MSB-first
    var b = 63
    while (b >= 0) {
      i = 0
      while (i < n) {
        if (((keys(i) >>> b) & 1L) != 0L)
          out(pos >> 3) = (out(pos >> 3) | (0x80 >>> (pos & 7))).toByte
        pos += 1
        i += 1
      }
      b -= 1
    }
    out
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZOrderCode = copy(children = newChildren)
}

object ZOrderFunctions {
  def zorder_code(cols: Column*): Column =
    GraftColumnBridge.column(ZOrderCode(cols.map(GraftColumnBridge.expression)))
}
