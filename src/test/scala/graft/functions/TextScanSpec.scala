package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.TextScanFunctions._

/** The byte kernels must be drop-in equivalent to the round-1
  * declarative formulations (regexp_extract_all / split+filter /
  * regexp_replace / LIKE) they replaced — those formulations are what
  * the DuckDB oracle re-states, so equivalence here is what keeps the
  * oracle hash-exact.
  */
class TextScanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // adversarial corpus: ASCII runs, unicode (2/3/4-byte), CJK range
  // edges, all \s variants, punctuation, empties, stopword shapes
  private val corpus: Seq[String] = Seq(
    "", " ", "   ", "a", "Z9", "abc123def", "123abc",
    "the quick brown fox, and a dog; of course!",
    "the a of and is to in", "THE A OF", "then andy ofx", "a  b   c",
    " leading and trailing ", "tabs\tand\nnewlinesvt\ffeed\rcr",
    "éclair café naïve", "über straße", "emoji 😀 pair",
    "中文文本测试", "一丁 一䷿鿿ꀀ mixed 中 text",
    "punct.,;:!?only", "a.b,c;d:e!f?g", "«quoted» — dash…",
    "der und nicht", " der ", "xder y", "no stop words here",
    "ends with der", "der starts", " le la et ", " el que los ",
    "mixed the und le el 中",
    "num3er5 and s1gn5 !!", " nbsp space", " ls",
    "\u4dff below block", "\u4e00 start", "\u9fff end", "\ua000 above",
    "ideo\u3000space", "4byte \ud83d\ude00 emoji",
  ) ++ (0 until 50).map { i =>
    // pseudo-random printable + unicode soup, deterministic
    val r = new scala.util.Random(42 + i)
    (0 until r.nextInt(80)).map { _ =>
      val c = r.nextInt(10) match {
        case 0 => ' '
        case 1 => ('\t' + r.nextInt(5)).toChar // \t \n  \f \r
        case 2 => ('.' :: ',' :: ';' :: ':' :: '!' :: '?' :: Nil)(r.nextInt(6))
        case 3 => ('0' + r.nextInt(10)).toChar
        case 4 => (0x4e00 + r.nextInt(0x5200)).toChar // CJK
        case 5 => (0xe9 + r.nextInt(64)).toChar       // latin-1 supplement
        case _ => ('a' + r.nextInt(26)).toChar
      }
      c
    }.mkString
  }

  private lazy val df = corpus.toDF("text").cache()

  test("token_count ≡ size(regexp_extract_all)") {
    val bad = df.select(
        token_count($"text").as("k"),
        size(regexp_extract_all($"text", lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).as("r"),
        $"text")
      .where($"k" =!= $"r").collect()
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("word_count ≡ size(filter(split(text,' '), non-empty))") {
    val bad = df.select(
        word_count($"text").as("k"),
        size(filter(split($"text", " "), w => w =!= "")).as("r"), $"text")
      .where($"k" =!= $"r").collect()
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("stop_count ≡ size(filter(words, isin(stopwords)))") {
    val stop = Seq("the", "a", "of", "and", "is", "to", "in")
    val w = filter(split($"text", " "), x => x =!= "")
    val bad = df.select(
        stop_count($"text").as("k"),
        size(filter(w, t => t.isin(stop: _*))).as("r"), $"text")
      .where($"k" =!= $"r").collect()
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("punct_count ≡ length - length(regexp_replace)") {
    val bad = df.select(
        punct_count($"text").as("k"),
        (length($"text") - length(regexp_replace($"text", "[.,;:!?]", ""))).as("r"), $"text")
      .where($"k" =!= $"r").collect()
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("has_cjk ≡ regexp_count([\\u4e00-\\u9fff]) > 0, incl. block edges") {
    val bad = df.select(
        has_cjk($"text").as("k"),
        (regexp_count($"text", lit("[\\u4e00-\\u9fff]")) > 0).as("r"), $"text")
      .where($"k" =!= $"r").collect()
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("kernels are null-safe and codegen-compatible") {
    val d = Seq(Option("x y"), None).toDF("text")
    val out = d.select(token_count($"text"), word_count($"text"),
      stop_count($"text"), punct_count($"text"), has_cjk($"text")).collect()
    assert(out(0).getInt(0) === 2)
    assert((0 until 5).forall(out(1).isNullAt))
  }
}
