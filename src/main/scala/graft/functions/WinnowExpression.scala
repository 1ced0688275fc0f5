package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken '03)
  * over a Rabin-Karp rolling hash — the plagiarism/near-dup
  * fingerprint family the north star names "document fingerprinting
  * (rolling hash)".
  *
  * One pass over the UTF-8 bytes: k-gram hashes roll in O(1) per byte
  * (subtract the outgoing byte's highest-power term, multiply, add the
  * incoming byte); a sliding window of `w` consecutive k-gram hashes
  * selects each window's minimum (rightmost on ties — standard robust
  * winnowing), deduplicated. Guarantees: any shared substring of
  * length ≥ w+k−1 between two documents yields at least one shared
  * fingerprint, so `array_intersect` on the outputs is a sound
  * containment/overlap detector at 100 TB (fingerprint count ≈
  * 2·len/(w+1), independent of vocabulary).
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 2 && k <= 64, s"bad k-gram size $k")
  require(w >= 1 && w <= 256, s"bad winnow window $w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  private val Base = 1000003L
  // Base^(k-1) for the rolling subtract, in wrapping 64-bit arithmetic
  private val TopPow: Long = {
    var p = 1L
    var i = 1
    while (i < k) { p *= Base; i += 1 }
    p
  }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].getBytes
    val n = s.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val nGrams = n - k + 1
    val hashes = new Array[Long](nGrams)
    var h = 0L
    var i = 0
    while (i < k) { h = h * Base + (s(i) & 0xff); i += 1 }
    hashes(0) = h
    i = k
    while (i < n) {
      h = (h - (s(i - k) & 0xff) * TopPow) * Base + (s(i) & 0xff)
      hashes(i - k + 1) = h
      i += 1
    }
    // robust winnowing: min of each window of w hashes, rightmost ties
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    if (nGrams <= w) {
      var m = 0
      var j = 1
      while (j < nGrams) { if (hashes(j) <= hashes(m)) m = j; j += 1 }
      out.add(hashes(m))
    } else {
      var m = -1
      var start = 0
      while (start + w <= nGrams) {
        if (m < start) {
          m = start
          var j = start + 1
          while (j < start + w) { if (hashes(j) <= hashes(m)) m = j; j += 1 }
          out.add(hashes(m))
        } else {
          val incoming = start + w - 1
          if (hashes(incoming) <= hashes(m)) { m = incoming; out.add(hashes(m)) }
        }
        start += 1
      }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFunctions {
  def winnow_fingerprints(text: Column, k: Int = 8, w: Int = 4): Column =
    GraftColumnBridge.column(
      WinnowFingerprints(GraftColumnBridge.expression(text.cast("string")), k, w))
}
