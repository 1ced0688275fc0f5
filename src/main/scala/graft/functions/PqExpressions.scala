package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou et al., "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011 — the FAISS `PQx` index
  * family). The codebooks — `m` subspaces × `ksub` centroids ×
  * `dsub` dims — are INDEX STATE carried inside the expressions, like
  * [[CentroidArgmax]]'s centroid table: encode/LUT/score all run as
  * pure scan-stage maps with no join and no shuffle, and the state is
  * bounded by index parameters, never by data size.
  *
  * Scale shape: the corpus is represented by `m` small ints per vector
  * (m bytes at ksub ≤ 256) instead of `4·dim` bytes — at 100 TB of
  * embeddings the PQ code table is the only thing the search fans over
  * (a ~32× squeeze at dim=64, m=8), and ADC scoring is O(m) per
  * (probe, candidate) pair against a per-probe lookup table, not
  * O(dim).
  */
private object Pq {
  /** Flatten codebooks to a compact primitive layout once per task:
    * sub m, centroid j, dim d → flat[(m*ksub + j)*dsub + d].
    */
  def flatten(cb: Seq[Seq[Seq[Float]]]): (Array[Float], Int, Int, Int) = {
    val m = cb.length
    val ksub = cb.head.length
    val dsub = cb.head.head.length
    val flat = new Array[Float](m * ksub * dsub)
    var i = 0
    var mi = 0
    while (mi < m) {
      var j = 0
      while (j < ksub) {
        val c = cb(mi)(j)
        var d = 0
        while (d < dsub) { flat(i) = c(d); i += 1; d += 1 }
        j += 1
      }
      mi += 1
    }
    (flat, m, ksub, dsub)
  }
}

/** PQ encode: float vector → `m` centroid ids (L2-argmin per
  * subspace). Subvector `mi` covers dims `[mi*dsub, (mi+1)*dsub)`;
  * a vector shorter than `m*dsub` treats missing dims as 0. Ties
  * break to the larger id (same convention as [[CentroidArgmax]]).
  */
case class PqEncode(child: Expression, codebooks: Seq[Seq[Seq[Float]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "empty PQ codebooks")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  @transient private lazy val (flat, m, ksub, dsub) = Pq.flatten(codebooks)

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      val base = mi * dsub
      var best = Double.MaxValue
      var bestId = 0
      var j = 0
      while (j < ksub) {
        val cOff = (mi * ksub + j) * dsub
        var dist = 0.0
        var d = 0
        while (d < dsub) {
          val xv = if (base + d < n) x.getFloat(base + d) else 0.0f
          val diff = xv - flat(cOff + d)
          dist += diff * diff
          d += 1
        }
        if (dist < best || (dist == best && j > bestId)) { best = dist; bestId = j }
        j += 1
      }
      codes(mi) = bestId
      mi += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Per-probe ADC lookup table: `lut[mi*ksub + j] = <q_mi, c_mi_j>` —
  * the inner products of the query's subvectors with every centroid.
  * Computed ONCE per probe (O(dim·ksub)); every candidate afterwards
  * costs O(m) via [[PqAdc]].
  */
case class PqLut(child: Expression, codebooks: Seq[Seq[Seq[Float]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "pq_lut"

  @transient private lazy val (flat, m, ksub, dsub) = Pq.flatten(codebooks)

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    val lut = new Array[Float](m * ksub)
    var mi = 0
    while (mi < m) {
      val base = mi * dsub
      var j = 0
      while (j < ksub) {
        val cOff = (mi * ksub + j) * dsub
        var dot = 0.0
        var d = 0
        while (d < dsub) {
          val xv = if (base + d < n) x.getFloat(base + d) else 0.0f
          dot += xv * flat(cOff + d)
          d += 1
        }
        lut(mi * ksub + j) = dot.toFloat
        j += 1
      }
      mi += 1
    }
    new GenericArrayData(lut)
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

/** ADC score: `Σ_mi lut[mi*ksub + codes[mi]]` — the approximate inner
  * product of the probe and the candidate's RECONSTRUCTED vector, in
  * O(m) per pair. Codegen'd: this is the (probe × corpus) hot path.
  */
case class PqAdc(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val lut = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    var s = 0.0
    var mi = 0
    val m = codes.numElements()
    while (mi < m) { s += lut.getFloat(mi * ksub + codes.getInt(mi)); mi += 1 }
    java.lang.Double.valueOf(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lut, codes) => {
      val mi = ctx.freshName("mi"); val s = ctx.freshName("s")
      s"""
         |double $s = 0.0;
         |for (int $mi = 0; $mi < $codes.numElements(); $mi++) {
         |  $s += $lut.getFloat($mi * $ksub + $codes.getInt($mi));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdc =
    copy(left = l, right = r)
}

object PqFunctions {
  def pq_encode(vec: Column, codebooks: Seq[Seq[Seq[Float]]]): Column =
    GraftColumnBridge.column(PqEncode(
      GraftColumnBridge.expression(vec.cast("array<float>")), codebooks))

  def pq_lut(vec: Column, codebooks: Seq[Seq[Seq[Float]]]): Column =
    GraftColumnBridge.column(PqLut(
      GraftColumnBridge.expression(vec.cast("array<float>")), codebooks))

  def pq_adc(lut: Column, codes: Column, ksub: Int): Column =
    GraftColumnBridge.column(PqAdc(
      GraftColumnBridge.expression(lut),
      GraftColumnBridge.expression(codes), ksub))
}
