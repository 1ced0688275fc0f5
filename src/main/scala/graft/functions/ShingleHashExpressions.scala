package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct 64-bit hashes of word n-gram shingles, WITHOUT ever
  * materializing the shingle strings.
  *
  * The dedup pipelines (`ngramJaccardPairs`, `minHashLshPairs`, the
  * curation pipeline) only ever consume shingles as join/hash keys, so
  * building a `word_shingles` string array and hashing it downstream
  * pays concatWs allocations + a string set + re-reading every shingle
  * byte — per row. This expression assembles each shingle's bytes
  * (words joined by 0x20) in a reused buffer and emits
  * `XXH64(bytes, seed=42)` — BYTE-IDENTICAL to
  * `xxhash64(word_shingles(...))` element-wise (same algorithm, seed,
  * and byte sequence as Spark's `xxhash64` on the concatenated
  * string), so downstream bucket joins produce identical results.
  * Output is sorted distinct (set semantics match
  * `word_shingles`' distinct, order irrelevant to set consumers).
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1 && n <= 16, s"bad shingle width $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  // per-task instance (plans deserialize per task): reusable buffer
  @transient private var buf: Array[Byte] = _

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val count = words.numElements() - (n - 1)
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Long](count)
    var i = 0
    while (i < count) {
      // null elements are SKIPPED, matching concatWs inside
      // word_shingles (no separator emitted for them either) — the
      // byte-identity contract with xxhash64(word_shingles(...)) must
      // hold on null-bearing inputs too
      var len = 0
      var present = 0
      var o = 0
      while (o < n) {
        val w = words.getUTF8String(i + o)
        if (w != null) { len += w.numBytes(); present += 1 }
        o += 1
      }
      len += math.max(present - 1, 0)
      if (buf == null || buf.length < len) buf = new Array[Byte](math.max(len, 64))
      var pos = 0
      o = 0
      while (o < n) {
        val w = words.getUTF8String(i + o)
        if (w != null) {
          if (pos > 0) { buf(pos) = ' '; pos += 1 }
          w.writeToMemory(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + pos)
          pos += w.numBytes()
        }
        o += 1
      }
      out(i) = XXH64.hashUnsafeBytes(buf,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len, 42L)
      i += 1
    }
    // sorted distinct in place — set semantics without a hash set
    java.util.Arrays.sort(out)
    var w = 0
    var r = 0
    while (r < count) {
      if (r == 0 || out(r) != out(r - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** MinHash signature computed from PRE-HASHED shingles: position i is
  * the min over shingle base-hashes h of the 2-universal permutation
  * `a_i * h + b_i (mod 2^64)` — `a_i` odd makes each map a bijection
  * on 64-bit ints, so min-tracking under signed order is minhash over
  * a permuted universe. One multiply+add per (shingle, position)
  * replaces a full XXH64 re-hash (~5× fewer ALU ops in the single
  * hottest dedup kernel at corpus scale); the multiplier/offset tables
  * derive deterministically from XXH64 of the position, so signatures
  * are stable across runs and partitions. This is the hash family
  * shape Spark MLlib's MinHashLSH uses (`(a·x + b) mod prime`); the
  * base hashes are already XXH64-uniform, and the exact-verify pass
  * downstream keeps the output set exact regardless of family.
  */
case class MinHashSigFromHashes(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k > 0 && k <= 1024, s"bad minhash k=$k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig_hashes"

  // deterministic per-position permutation parameters (shared across
  // all instances of the same k — the tables are pure functions of k)
  @transient private lazy val as: Array[Long] =
    Array.tabulate(k)(i => XXH64.hashLong(i.toLong, 0x9E3779B97F4A7C15L) | 1L)
  @transient private lazy val bs: Array[Long] =
    Array.tabulate(k)(i => XXH64.hashLong(i.toLong, 0xC2B2AE3D27D4EB4FL))

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val m = hs.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    val a = as; val b = bs
    var j = 0
    while (j < m) {
      // skip null elements (MinHashSig's contract) — getLong on a null
      // would silently unbox to 0 and corrupt every signature position
      if (!hs.isNullAt(j)) {
        val h = hs.getLong(j)
        var i = 0
        while (i < k) {
          val v = a(i) * h + b(i)
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigFromHashes =
    copy(child = newChild)
}

object ShingleHashFunctions {
  // coerce inputs like the sibling HashFunctions helpers: the
  // expressions read tungsten arrays positionally, so a mistyped array
  // would yield garbage per-row instead of an analysis error
  def shingle_hashes(words: Column, n: Int): Column =
    GraftColumnBridge.column(ShingleHashes(
      GraftColumnBridge.expression(words.cast("array<string>")), n))
  def minhash_sig_hashes(hashes: Column, k: Int): Column =
    GraftColumnBridge.column(MinHashSigFromHashes(
      GraftColumnBridge.expression(hashes.cast("array<bigint>")), k))
}
