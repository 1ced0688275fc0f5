package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded top-k state: a size-k min-heap on "goodness" (score desc,
  * item asc on ties), so the head is always the worst kept entry and
  * an insert against a full heap is one compare + (rarely) one
  * poll/offer. Memory is O(k) regardless of how many rows flow
  * through — the whole point of the aggregate.
  */
final class TopKBuffer(val k: Int) {
  import TopKBuffer.worstFirst
  val heap = new java.util.PriorityQueue[(Double, UTF8String)](math.max(1, k), worstFirst)

  def insert(score: Double, item: UTF8String): Unit =
    if (heap.size < k) heap.offer((score, item))
    else if (worstFirst.compare((score, item), heap.peek) > 0) {
      heap.poll(); heap.offer((score, item))
    }

  /** Entries best-first — the presentation order of the result array. */
  def sortedBestFirst: Array[(Double, UTF8String)] = {
    val arr = heap.toArray(new Array[(Double, UTF8String)](heap.size))
    java.util.Arrays.sort(arr, worstFirst.reversed())
    arr
  }
}

object TopKBuffer {
  /** Total order, worst entry smallest: lower score is worse; on equal
    * scores the LARGER item is worse (item-ascending tiebreak). Total
    * ⇒ the kept multiset is unique for any input order — exact, not
    * "approximately top-k".
    */
  val worstFirst: java.util.Comparator[(Double, UTF8String)] =
    new java.util.Comparator[(Double, UTF8String)] {
      override def compare(a: (Double, UTF8String), b: (Double, UTF8String)): Int = {
        val c = java.lang.Double.compare(a._1, b._1)
        if (c != 0) c else b._2.compareTo(a._2)
      }
    }
}

/** `topk_by(score, item, k)` — EXACT per-group top-k as a custom
  * Catalyst [[TypedImperativeAggregate]], the extension point Spark
  * reserves for aggregates with non-row buffer state (its own
  * `percentile_approx`/`count_min_sketch` shape).
  *
  * Result: `array<struct<score double, item string>>`, best-first,
  * ties broken item-ascending. Null score or item rows are ignored
  * (standard aggregate null semantics). The kept multiset is unique
  * because the order is total, so results are partition- and
  * merge-order-invariant — oracle-exact against a `row_number()`
  * window.
  *
  * Why not `row_number() OVER (PARTITION BY g ORDER BY ...)` ≤ k? At
  * 100 TB that window SORTS EVERY GROUP IN FULL: the exchange carries
  * all rows and the sort pays O(n log n) per group for rows it will
  * throw away. This aggregate keeps an O(k) heap per group per
  * partition, so the map-side partial bounds the shuffle to
  * k rows × groups × partitions and there is no sort at all — the
  * same partial-merge-final contract every built-in aggregate rides.
  */
case class TopKByScore(score: Expression, item: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, s"topk_by k must be positive, got $k")

  override def children: Seq[Expression] = Seq(score, item)
  // both construction paths insert Casts; this is the analysis-time
  // backstop for hand-built instances
  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && item.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topk_by expects (double, string), got (${score.dataType}, ${item.dataType})")
  override def nullable: Boolean = false
  override def dataType: DataType = TopKByScore.resultType
  override def prettyName: String = "topk_by"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val it = item.eval(input)
    // clone: the UTF8String is backed by the row buffer the scan reuses
    if (s != null && it != null)
      b.insert(s.asInstanceOf[Double], it.asInstanceOf[UTF8String].clone())
    b
  }

  override def merge(b: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    val it = other.heap.iterator()
    while (it.hasNext) { val e = it.next(); b.insert(e._1, e._2) }
    b
  }

  override def eval(b: TopKBuffer): Any =
    new GenericArrayData(b.sortedBestFirst.map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i)): Any
    })

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.k)
    out.writeInt(b.heap.size)
    val it = b.heap.iterator()
    while (it.hasNext) {
      val (s, i) = it.next()
      out.writeDouble(s)
      val bytes = i.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new TopKBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val s = in.readDouble()
      val bs = new Array[Byte](in.readInt())
      in.readFully(bs)
      buf.insert(s, UTF8String.fromBytes(bs))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), item = newChildren(1))
}

object TopKByScore {
  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("item", StringType, nullable = false))), containsNull = false)
}

object TopKFunctions {
  /** DataFrame face of [[TopKByScore]]; coerces like the SQL builder. */
  def topk_by(score: Column, item: Column, k: Int): Column =
    GraftColumnBridge.column(TopKByScore(
      GraftColumnBridge.expression(score.cast("double")),
      GraftColumnBridge.expression(item.cast("string")), k).toAggregateExpression())
}
