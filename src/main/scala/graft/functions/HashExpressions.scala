package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the LLM-data-pipeline dedup
  * operators (north star; SURVEY.md §7.3 "custom vs built-in").
  *
  * Single-pass over the token/shingle array per row, operating directly
  * on tungsten `ArrayData`/`UTF8String` (no boxing, no Scala closures),
  * so a MinHash signature costs one array traversal per hash batch
  * instead of the k × n traversals a `transform`/UDF composition would.
  * At 100 TB these run embedded in the scan stage — no extra shuffle.
  */

/** 128-to-k MinHash signature of a string array (shingle set).
  *
  * sig[i] = min over shingles s of xxh64(s, seed=i). Jaccard(A,B) ≈
  * fraction of agreeing signature positions (Broder '97). Empty/null
  * shingle arrays yield Long.MaxValue positions so they never collide
  * into LSH bands with real content.
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k > 0 && k <= 1024, s"bad minhash k=$k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j)
      if (s != null) {
        val base = s.getBaseObject
        val off = s.getBaseOffset
        val len = s.numBytes()
        var i = 0
        while (i < k) {
          val h = XXH64.hashUnsafeBytes(base, off, len, i)
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** 64-bit SimHash of a token array (Charikar '02): bit b of the result
  * is 1 iff the sum over tokens of ±1 (sign of bit b of hash(token))
  * is positive. Near-identical token multisets → small Hamming
  * distance. Token multiplicity is naturally weight.
  *
  * Two per-token hash families:
  *   - default (`md5Bits = false`): XXH64 — fastest, engine-internal;
  *   - `md5Bits = true`: bits derived from the token's md5 hex digest
  *     (bit i = bit i%4 of hex nibble i/4). md5 is byte-identical in
  *     every engine, so a SQL oracle (DuckDB `md5()` + nibble
  *     arithmetic) can restate the fingerprint bit-for-bit — the same
  *     cross-engine-verifiability trade [[graft.ops.TextOps.fingerprint]]
  *     makes. The voting/banding algorithm is identical either way.
  */
case class SimHash64(child: Expression, md5Bits: Boolean = false)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = if (md5Bits) "simhash64_md5" else "simhash64"

  // one digest instance per thread: MessageDigest is stateful and the
  // same deserialized expression can be evaluated by concurrent tasks
  @transient private lazy val mdLocal =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val acc = new Array[Int](64)
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j)
      if (s != null) {
        if (md5Bits) {
          val d = mdLocal.get().digest(s.getBytes)
          var i = 0
          while (i < 64) {
            val hexIdx = i >> 2 // hex-digest char index, 0..15
            val nib =
              if ((hexIdx & 1) == 0) (d(hexIdx >> 1) >> 4) & 0xF
              else d(hexIdx >> 1) & 0xF
            if (((nib >> (i & 3)) & 1) == 1) acc(i) += 1 else acc(i) -= 1
            i += 1
          }
        } else {
          val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 0)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
            b += 1
          }
        }
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Random-hyperplane LSH bucket of a float-vector column (Charikar
  * '02 SRP): bit j of the bucket = sign(dot(vec, plane_j)). Vectors
  * with high cosine similarity collide with probability
  * (1 - angle/π)^bits. Planes are derived deterministically from
  * (seed, table) so both sides of a join bucket identically.
  */
case class HyperplaneBucket(child: Expression, dim: Int, bits: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  require(bits > 0 && bits <= 30, s"bad lsh bits=$bits")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "hyperplane_bucket"

  // deterministic planes; regenerated identically on every executor
  @transient private lazy val planes: Array[Array[Float]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(bits, dim)(rnd.nextGaussian().toFloat)
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), dim)
    var bucket = 0
    var b = 0
    while (b < bits) {
      val p = planes(b)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += arr.getFloat(i) * p(i); i += 1 }
      if (dot > 0) bucket |= (1 << b)
      b += 1
    }
    java.lang.Integer.valueOf(bucket)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}

object HashFunctions {
  // coerce inputs: the expressions read tungsten arrays positionally
  private def strArr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    GraftColumnBridge.expression(c.cast("array<string>"))
  private def fltArr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    GraftColumnBridge.expression(c.cast("array<float>"))

  def minhash_sig(c: Column, k: Int): Column = GraftColumnBridge.column(MinHashSig(strArr(c), k))
  def simhash64(c: Column, md5Bits: Boolean = false): Column =
    GraftColumnBridge.column(SimHash64(strArr(c), md5Bits))
  def hyperplane_bucket(c: Column, dim: Int, bits: Int, seed: Long): Column =
    GraftColumnBridge.column(HyperplaneBucket(fltArr(c), dim, bits, seed))
}
