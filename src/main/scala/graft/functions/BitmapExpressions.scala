package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.roaringbitmap.longlong.Roaring64Bitmap

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Shared codec + set algebra over serialized Roaring64 bitmaps.
  * Plain object ⇒ Scala emits static forwarders, so generated Java
  * calls `graft.functions.BitmapOps.count(bytes)` directly.
  */
object BitmapOps {
  def toBytes(bm: Roaring64Bitmap): Array[Byte] = {
    bm.runOptimize()
    val bos = new ByteArrayOutputStream()
    bm.serialize(new DataOutputStream(bos))
    bos.toByteArray
  }
  def fromBytes(bytes: Array[Byte]): Roaring64Bitmap = {
    val bm = new Roaring64Bitmap()
    bm.deserialize(new DataInputStream(new ByteArrayInputStream(bytes)))
    bm
  }
  def count(bytes: Array[Byte]): Long = fromBytes(bytes).getLongCardinality
  def andCount(a: Array[Byte], b: Array[Byte]): Long =
    Roaring64Bitmap.andCardinality(fromBytes(a), fromBytes(b))
  def orCount(a: Array[Byte], b: Array[Byte]): Long = {
    val x = fromBytes(a); x.or(fromBytes(b)); x.getLongCardinality
  }
  def andNot(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val x = fromBytes(a); x.andNot(fromBytes(b)); toBytes(x)
  }
}

/** `bitmap64_agg(id)` — EXACT distinct-id set per group as a compressed
  * Roaring bitmap (`binary` result), the ClickHouse `groupBitmap` /
  * Druid segment shape for count-distinct at scale.
  *
  * Why a bitmap instead of `count(distinct id)`: the partial state is
  * MERGEABLE and REUSABLE. Map-side partials bound the shuffle to one
  * compressed bitmap per group per partition (vs. every distinct id
  * crossing the wire for the built-in's expand-then-dedup plan), and
  * the materialized segments answer an entire family of follow-ups —
  * audience overlap, retention intersections, incremental rollups —
  * with driver-free set algebra ([[BitmapCountExpr]] /
  * [[BitmapAndCountExpr]]) instead of re-scanning 100 TB of raw
  * events. Null ids are ignored (standard aggregate semantics).
  *
  * Spark 4 ships its own `bitmap_construct_agg` family, but those are
  * DENSE fixed 4 KB buckets: callers must pre-shard ids with
  * `bitmap_bucket_number`/`bitmap_bit_position` (one output row per
  * 32768-id range per group) and no intersection operator exists.
  * Roaring gives one compressed segment per group for arbitrary
  * 64-bit ids plus AND/OR algebra — hence the custom aggregate. The
  * whole family is namespaced `bitmap64_*` in both the SQL registry
  * and [[BitmapFunctions]], so none of Spark's built-in `bitmap_*`
  * names are shadowed.
  */
case class BitmapAggExpr(child: Expression,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Roaring64Bitmap] {

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bitmap64_agg expects a bigint id, got ${child.dataType}")
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bitmap64_agg"

  override def createAggregationBuffer(): Roaring64Bitmap = new Roaring64Bitmap()

  override def update(b: Roaring64Bitmap, input: InternalRow): Roaring64Bitmap = {
    val v = child.eval(input)
    if (v != null) b.addLong(v.asInstanceOf[Long])
    b
  }

  override def merge(b: Roaring64Bitmap, other: Roaring64Bitmap): Roaring64Bitmap = {
    b.or(other); b
  }

  override def eval(b: Roaring64Bitmap): Any = BitmapOps.toBytes(b)
  override def serialize(b: Roaring64Bitmap): Array[Byte] = BitmapOps.toBytes(b)
  override def deserialize(bytes: Array[Byte]): Roaring64Bitmap = BitmapOps.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitmapAggExpr =
    copy(child = newChildren(0))
}

/** `bitmap64_or_agg(bm)` — UNION of already-aggregated serialized
  * segments (ClickHouse `groupBitmapOrState`). This is what makes
  * bitmap segments composable upward: daily per-key segments OR-merge
  * into weekly/monthly distinct sets without ever touching raw ids —
  * the only exact answer to non-additive rolling distinct counts that
  * doesn't re-scan the fact table per window.
  */
case class BitmapOrAggExpr(child: Expression,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Roaring64Bitmap] {

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bitmap64_or_agg expects a serialized bitmap (binary), got ${child.dataType}")
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bitmap64_or_agg"

  override def createAggregationBuffer(): Roaring64Bitmap = new Roaring64Bitmap()

  override def update(b: Roaring64Bitmap, input: InternalRow): Roaring64Bitmap = {
    val v = child.eval(input)
    if (v != null) b.or(BitmapOps.fromBytes(v.asInstanceOf[Array[Byte]]))
    b
  }

  override def merge(b: Roaring64Bitmap, other: Roaring64Bitmap): Roaring64Bitmap = {
    b.or(other); b
  }

  override def eval(b: Roaring64Bitmap): Any = BitmapOps.toBytes(b)
  override def serialize(b: Roaring64Bitmap): Array[Byte] = BitmapOps.toBytes(b)
  override def deserialize(bytes: Array[Byte]): Roaring64Bitmap = BitmapOps.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapOrAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapOrAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitmapOrAggExpr =
    copy(child = newChildren(0))
}

/** `bitmap64_count(bm)` — cardinality of a serialized bitmap. Runs over
  * aggregate OUTPUT rows (one per group), never the raw scan.
  */
case class BitmapCountExpr(child: Expression)
  extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "bitmap64_count"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"bitmap64_count expects binary, got ${child.dataType}")
  override protected def nullSafeEval(input: Any): Any =
    BitmapOps.count(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BitmapOps.count($c)")
  override protected def withNewChildInternal(newChild: Expression): BitmapCountExpr =
    copy(child = newChild)
}

/** `bitmap64_and_count(a, b)` — |A ∩ B| without materializing either id
  * set: audience overlap / retention intersections as pure segment
  * algebra over already-aggregated bitmaps.
  */
case class BitmapAndCountExpr(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "bitmap64_and_count"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bitmap64_and_count expects (binary, binary), got (${left.dataType}, ${right.dataType})")
  override protected def nullSafeEval(a: Any, b: Any): Any =
    BitmapOps.andCount(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.BitmapOps.andCount($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): BitmapAndCountExpr =
    copy(left = newLeft, right = newRight)
}

/** `bitmap64_remove(bm, rm)` — A ∖ B over serialized segments
  * (Roaring ANDNOT). The erasure primitive for bitmap-backed derived
  * state: a right-to-be-forgotten request removes the subject's ids
  * from every segment WITHOUT rebuilding it from raw events (which may
  * already be scrubbed) — see [[graft.lake.Privacy.forgetSegments]].
  */
case class BitmapRemoveExpr(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bitmap64_remove"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bitmap64_remove expects (binary, binary), got (${left.dataType}, ${right.dataType})")
  override protected def nullSafeEval(a: Any, b: Any): Any =
    BitmapOps.andNot(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.BitmapOps.andNot($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): BitmapRemoveExpr =
    copy(left = newLeft, right = newRight)
}

/** `bitmap64_or_count(a, b)` — |A ∪ B| over serialized segments. */
case class BitmapOrCountExpr(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "bitmap64_or_count"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bitmap64_or_count expects (binary, binary), got (${left.dataType}, ${right.dataType})")
  override protected def nullSafeEval(a: Any, b: Any): Any =
    BitmapOps.orCount(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.BitmapOps.orCount($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): BitmapOrCountExpr =
    copy(left = newLeft, right = newRight)
}

object BitmapFunctions {
  def bitmap64_agg(id: Column): Column =
    GraftColumnBridge.column(BitmapAggExpr(
      GraftColumnBridge.expression(id.cast("long"))).toAggregateExpression())
  def bitmap64_or_agg(bm: Column): Column =
    GraftColumnBridge.column(BitmapOrAggExpr(
      GraftColumnBridge.expression(bm)).toAggregateExpression())
  def bitmap64_count(bm: Column): Column =
    GraftColumnBridge.column(BitmapCountExpr(GraftColumnBridge.expression(bm)))
  def bitmap64_and_count(a: Column, b: Column): Column =
    GraftColumnBridge.column(BitmapAndCountExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  def bitmap64_or_count(a: Column, b: Column): Column =
    GraftColumnBridge.column(BitmapOrCountExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  def bitmap64_remove(bm: Column, rm: Column): Column =
    GraftColumnBridge.column(BitmapRemoveExpr(
      GraftColumnBridge.expression(bm), GraftColumnBridge.expression(rm)))
}
