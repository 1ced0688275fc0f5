package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** Efraimidis–Spirakis weighted sampling: deterministic, exact-k per
  * source, and verifiably length-biased (the whole point of the
  * weights) against the plain-Scala computation of the same keys.
  */
class WeightedSampleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("matches the plain-Scala priority computation exactly") {
    val docs = Tables(spark, dir).documents
      .select($"doc_id", $"source", $"n_chars")
      .as[(Long, String, Long)].collect()
    def key(id: Long, w: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(13)
      val m = java.lang.Long.parseLong(hex, 16)
      math.log((m + 1).toDouble / 4503599627370496.0) / w
    }
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (src, xs) =>
      xs.toSeq.map(d => (d._1, key(d._1, d._3)))
        .sortBy { case (id, k) => (-k, id) }.take(20).zipWithIndex
        .map { case ((id, _), i) => (src, id, (i + 1).toLong) }
    }.toSet
    val got = TextQueries.weightedSample(spark, dir)
      .as[(String, Long, Long)].collect().toSet
    assert(got === expected)
  }

  test("sample is length-biased: sampled docs are longer than average") {
    val all = Tables(spark, dir).documents.select($"doc_id", $"n_chars")
      .as[(Long, Long)].collect().toMap
    val sampled = TextQueries.weightedSample(spark, dir)
      .select($"doc_id").as[Long].collect()
    val meanAll = all.values.sum.toDouble / all.size
    val meanSampled = sampled.map(all).sum.toDouble / sampled.length
    assert(meanSampled > meanAll,
      s"weighted sample mean $meanSampled should exceed corpus mean $meanAll")
  }
}
