package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain` over a driver-built
  * [[org.apache.spark.util.sketch.BloomFilter]] — the row-level tier of
  * the lake runtime filter ([[graft.lake.RuntimeFilter]]).
  *
  * Spark has this expression internally (`BloomFilterMightContain`),
  * but only its own optimizer rule can inject it, the rule fires only
  * for shuffle-join shapes it recognizes, and the expression is not
  * callable from user code. This is the same mechanic made deliberate:
  * the serialized filter rides in the expression (as Spark's own
  * injected filter does via a bytes literal), deserializes lazily once
  * per JVM, and the membership probe inlines into whole-stage codegen
  * so the filter runs inside the scan stage, upstream of the exchange
  * it exists to shrink.
  *
  * Insert/query symmetry: `DataFrameStatFunctions.bloomFilter` puts
  * integral columns via `putLong` and strings via their UTF-8 bytes,
  * so the probe uses `mightContainLong` / `mightContainBinary` on the
  * same representations.
  */
case class BloomMightContainExpr(child: Expression, bits: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  // rebuilt from `bits` after Java deserialization on executors; the
  // interpreted path probes this instance, codegen references it via
  // the ctx object array
  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bits))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType | StringType =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain supports integral and string keys, not $other")
  }

  override protected def nullSafeEval(input: Any): Any = child.dataType match {
    case LongType    => bloom.mightContainLong(input.asInstanceOf[Long])
    case IntegerType => bloom.mightContainLong(input.asInstanceOf[Int].toLong)
    case ShortType   => bloom.mightContainLong(input.asInstanceOf[Short].toLong)
    case ByteType    => bloom.mightContainLong(input.asInstanceOf[Byte].toLong)
    case StringType  =>
      bloom.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)
    case other => throw new IllegalStateException(s"unchecked type $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    child.dataType match {
      case StringType =>
        defineCodeGen(ctx, ev, c => s"$ref.mightContainBinary(($c).getBytes())")
      case _ =>
        defineCodeGen(ctx, ev, c => s"$ref.mightContainLong((long)($c))")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainExpr =
    copy(child = newChild)
}

object BloomFunctions {
  import GraftColumnBridge.{column => col, expression => expr}

  /** True iff `key` might be in the serialized bloom filter (false
    * positives at the filter's fpp; never false negatives).
    */
  def bloom_might_contain(key: Column, bits: Array[Byte]): Column =
    col(BloomMightContainExpr(expr(key), bits))
}
