package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass, zero-allocation text-scan kernels for the quality /
  * token-stats / language-ID queries (north star; the reference itself
  * computes no text functions — SURVEY.md §2.8).
  *
  * The declarative formulations (`size(regexp_extract_all(...))`,
  * `size(filter(split(text," "), ...))`, `length(regexp_replace(...))`)
  * are semantically identical but materialize a token array / rewritten
  * string per row per signal — at corpus scale that is GBs of garbage
  * per partition and regex-engine time that dwarfs the scan. Each
  * kernel here is one forward pass over the UTF-8 bytes with no
  * allocation, implements `doGenCode`, and so stays inside whole-stage
  * codegen in the scan stage.
  *
  * Byte-level correctness notes (all kernels operate on raw UTF-8):
  *  - ASCII classes ([A-Za-z], [0-9], punctuation) never match UTF-8
  *    continuation bytes (>= 0x80), so byte compares are exact.
  *  - Multi-byte codepoints count as single "mark" tokens, matching
  *    java.util.regex / RE2 semantics where a negated class consumes
  *    one codepoint: only lead bytes (0xC0-0xFF) are counted, the
  *    0x80-0xBF continuation bytes are skipped.
  *  - `\s` is the ASCII java.util.regex set [ \t\n\x0B\f\r] — the same
  *    set the round-1 regexp formulation matched against the oracle.
  */
object TextScan {
  private final val SP = ' '.toByte

  private def isAlpha(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')
  private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'
  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  /** Count of `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]` matches: alpha runs,
    * digit runs, and one per non-alnum-non-space codepoint.
    */
  def tokenCount(s: UTF8String): Int = {
    val n = s.numBytes()
    var i = 0
    var count = 0
    var state = 0 // 0=none, 1=alpha run, 2=digit run
    while (i < n) {
      val b = s.getByte(i)
      if ((b & 0x80) != 0) {
        // multi-byte codepoint: count lead bytes only
        if ((b & 0xc0) != 0x80) count += 1
        state = 0
      } else if (isAlpha(b)) {
        if (state != 1) { count += 1; state = 1 }
      } else if (isDigit(b)) {
        if (state != 2) { count += 1; state = 2 }
      } else if (isWs(b)) {
        state = 0
      } else {
        count += 1 // ASCII punctuation/symbol: one token each
        state = 0
      }
      i += 1
    }
    count
  }

  /** Count of non-empty segments under `split(text, " ")` semantics
    * (split on the single space character only).
    */
  def wordCount(s: UTF8String): Int = {
    val n = s.numBytes()
    var i = 0
    var count = 0
    var inWord = false
    while (i < n) {
      if (s.getByte(i) == SP) inWord = false
      else if (!inWord) { count += 1; inWord = true }
      i += 1
    }
    count
  }

  // the quality-filter stopword list (TextOps.stopwordRatio)
  private val stopWords: Array[Array[Byte]] =
    Array("the", "a", "of", "and", "is", "to", "in").map(_.getBytes("UTF-8"))

  /** Count of space-separated words that equal one of the quality
    * stopwords (the, a, of, and, is, to, in).
    */
  def stopCount(s: UTF8String): Int = {
    val n = s.numBytes()
    var i = 0
    var count = 0
    while (i < n) {
      while (i < n && s.getByte(i) == SP) i += 1
      if (i < n) {
        val start = i
        while (i < n && s.getByte(i) != SP) i += 1
        val len = i - start
        if (len <= 3) { // longest stopword
          var w = 0
          var hit = false
          while (w < stopWords.length && !hit) {
            val sw = stopWords(w)
            if (sw.length == len) {
              var j = 0
              while (j < len && s.getByte(start + j) == sw(j)) j += 1
              hit = j == len
            }
            w += 1
          }
          if (hit) count += 1
        }
      }
    }
    count
  }

  /** Count of ASCII sentence punctuation characters `[.,;:!?]`. */
  def punctCount(s: UTF8String): Int = {
    val n = s.numBytes()
    var i = 0
    var count = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b == '.' || b == ',' || b == ';' || b == ':' || b == '!' || b == '?')
        count += 1
      i += 1
    }
    count
  }

  /** True iff any codepoint lies in the CJK Unified Ideographs block
    * [U+4E00, U+9FFF]. In UTF-8 that range spans E4 B8 80 .. E9 BF BF,
    * so: lead byte in [E5,E9] always qualifies; lead E4 qualifies when
    * the second byte is >= B8.
    */
  def hasCjk(s: UTF8String): Boolean = {
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      val b = s.getByte(i) & 0xff
      if (b >= 0xe5 && b <= 0xe9) return true
      if (b == 0xe4 && i + 1 < n && (s.getByte(i + 1) & 0xff) >= 0xb8) return true
      i += 1
    }
    false
  }
}

/** Base for int-valued single-pass text kernels: evaluation is one
  * static call, codegen inlines the same call inside the scan stage.
  * (No constructor parameters: `Expression` itself is not
  * `Serializable`, so the first non-serializable ancestor of each case
  * class — this one — must keep a no-arg constructor for Java
  * deserialization on executors.)
  */
abstract class TextScanInt extends UnaryExpression {
  /** Name of the [[TextScan]] static kernel this expression inlines. */
  protected def method: String
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(input: Any): Any =
    evalKernel(input.asInstanceOf[UTF8String])
  protected def evalKernel(s: UTF8String): Int
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextScan.$method($c)")
}

case class TokenCountExpr(child: Expression) extends TextScanInt {
  override protected def method: String = "tokenCount"
  override def prettyName: String = "token_count"
  override protected def evalKernel(s: UTF8String): Int = TextScan.tokenCount(s)
  override protected def withNewChildInternal(newChild: Expression): TokenCountExpr =
    copy(child = newChild)
}

case class WordCountExpr(child: Expression) extends TextScanInt {
  override protected def method: String = "wordCount"
  override def prettyName: String = "word_count"
  override protected def evalKernel(s: UTF8String): Int = TextScan.wordCount(s)
  override protected def withNewChildInternal(newChild: Expression): WordCountExpr =
    copy(child = newChild)
}

case class StopCountExpr(child: Expression) extends TextScanInt {
  override protected def method: String = "stopCount"
  override def prettyName: String = "stop_count"
  override protected def evalKernel(s: UTF8String): Int = TextScan.stopCount(s)
  override protected def withNewChildInternal(newChild: Expression): StopCountExpr =
    copy(child = newChild)
}

case class PunctCountExpr(child: Expression) extends TextScanInt {
  override protected def method: String = "punctCount"
  override def prettyName: String = "punct_count"
  override protected def evalKernel(s: UTF8String): Int = TextScan.punctCount(s)
  override protected def withNewChildInternal(newChild: Expression): PunctCountExpr =
    copy(child = newChild)
}

case class HasCjkExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "has_cjk"
  override protected def nullSafeEval(input: Any): Any =
    TextScan.hasCjk(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextScan.hasCjk($c)")
  override protected def withNewChildInternal(newChild: Expression): HasCjkExpr =
    copy(child = newChild)
}

object TextScanFunctions {
  import GraftColumnBridge.{column => col, expression => expr}
  def token_count(text: Column): Column = col(TokenCountExpr(expr(text)))
  def word_count(text: Column): Column = col(WordCountExpr(expr(text)))
  def stop_count(text: Column): Column = col(StopCountExpr(expr(text)))
  def punct_count(text: Column): Column = col(PunctCountExpr(expr(text)))
  def has_cjk(text: Column): Column = col(HasCjkExpr(expr(text)))
}
