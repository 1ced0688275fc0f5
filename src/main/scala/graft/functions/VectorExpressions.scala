package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Cosine similarity of two float-vector columns.
  *
  * The ANN hot path evaluates this once per (probe, candidate) pair, so
  * it implements `doGenCode`: the generated Java loop stays inside
  * whole-stage codegen (no virtual calls, no boxing), unlike a Scala
  * UDF or a `zip_with`/`aggregate` higher-order-function composition.
  * north-star operator (BASELINE.json); no reference counterpart.
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i); val yv = y.getFloat(i)
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) java.lang.Double.valueOf(0.0)
    else java.lang.Double.valueOf(dot / (math.sqrt(nx) * math.sqrt(ny)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  float $xv = $x.getFloat($i);
         |  float $yv = $y.getFloat($i);
         |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |}
         |${ev.value} = ($nx == 0.0 || $ny == 0.0) ? 0.0 : $dot / (Math.sqrt($nx) * Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** Squared L2 norm of a float vector (used by the FoldSelfCosine
  * optimizer rule to keep zero-vector semantics after folding
  * `cosine_sim(x, x)` to a constant).
  */
case class NormSq(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "norm_sq"

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) { val v = x.getFloat(i); s += v * v; i += 1 }
    java.lang.Double.valueOf(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i"); val s = ctx.freshName("s"); val v = ctx.freshName("v")
      s"""
         |double $s = 0.0;
         |for (int $i = 0; $i < $x.numElements(); $i++) {
         |  float $v = $x.getFloat($i); $s += $v * $v;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NormSq =
    copy(child = newChild)
}

/** Id of the max-cosine centroid for a float vector, over a small
  * centroid table carried inside the expression (IVF assignment —
  * FAISS-style: centroids are index state, broadcast with the task
  * closure, so assignment is a pure scan-stage map with NO join and NO
  * shuffle; the round-1 formulation (broadcast cross-join + groupBy the
  * vector column + max_by) hashed every row's float array as a group
  * key).
  *
  * Tie-breaks like `max_by(centroid_id, struct(sim, centroid_id))`:
  * equal sims pick the larger id. The per-centroid arithmetic mirrors
  * [[CosineSim]] operation-for-operation, so a probe scored against a
  * centroid DataFrame via `cosine_sim` and a corpus vector assigned
  * here agree bit-for-bit on identical inputs.
  */
case class CentroidArgmax(child: Expression, centroids: Seq[Seq[Float]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(centroids.nonEmpty, "empty centroid table")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "centroid_argmax"

  @transient private lazy val cents: Array[Array[Float]] =
    centroids.map(_.toArray).toArray

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    var best = Double.NegativeInfinity
    var bestId = 0
    var c = 0
    while (c < cents.length) {
      val y = cents(c)
      val n = math.min(x.numElements(), y.length)
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      var i = 0
      while (i < n) {
        val xv = x.getFloat(i); val yv = y(i)
        dot += xv * yv; nx += xv * xv; ny += yv * yv
        i += 1
      }
      val sim = if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
      if (sim > best || (sim == best && c > bestId)) { best = sim; bestId = c }
      c += 1
    }
    bestId
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidArgmax =
    copy(child = newChild)
}

object VectorFunctions {
  def cosine_sim(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineSim(
      GraftColumnBridge.expression(a.cast("array<float>")),
      GraftColumnBridge.expression(b.cast("array<float>"))))

  def centroid_argmax(vec: Column, centroids: Seq[Array[Float]]): Column =
    GraftColumnBridge.column(CentroidArgmax(
      GraftColumnBridge.expression(vec.cast("array<float>")),
      centroids.map(_.toSeq)))
}
