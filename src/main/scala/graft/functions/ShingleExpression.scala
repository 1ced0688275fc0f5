package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a token array, in one pass.
  *
  * The declarative formulation
  * `array_distinct(transform(sequence(...), i -> concat_ws(element_at(w,i)...)))`
  * is semantically identical but catastrophically slower when `w` is
  * itself an expression: Catalyst inlines `w` into every `element_at`
  * call inside the lambda, so a 50-token document re-runs
  * `filter(split(text))` ~150 times per row (measured 9s for 5k docs at
  * sf0.1 — ~1.8ms/row). This expression evaluates its child exactly
  * once and builds the distinct shingle set in a single traversal.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1 && n <= 16, s"bad shingle width $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  private val space = UTF8String.fromString(" ")

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val count = words.numElements() - (n - 1)
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](count * 2)
    var i = 0
    while (i < count) {
      val parts = new Array[UTF8String](n)
      var o = 0
      while (o < n) { parts(o) = words.getUTF8String(i + o); o += 1 }
      seen.add(UTF8String.concatWs(space, parts: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object ShingleFunctions {
  def word_shingles(words: Column, n: Int): Column =
    GraftColumnBridge.column(WordShingles(GraftColumnBridge.expression(words), n))
}
