package graft.lake

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Runtime-filtered lake join: the dim's key set prunes the fact scan
  * at the file level without ever changing the join's answer, and the
  * cap / empty / null edges degrade to the exact plain-join result.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // files the executed plan actually read (partition pruning happens in
  // the file index's listFiles, which df.inputFiles ignores)
  private def filesRead(df: DataFrame): Long = {
    df.collect()
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case f: FileSourceScanExec    => Seq(f)
      case other                    => other.children.flatMap(scans)
    }
    scans(df.queryExecution.executedPlan).map(_.metrics("numFiles").value).sum
  }

  private def fresh(): (LakeCatalog, LakeTable) = {
    val cat = new LakeCatalog(spark, Files.createTempDirectory("rf-").toString)
    val fact = (0L until 400L).map(i => (i, i % 40L, i * 1.5)).toDF("id", "k", "v")
    cat.write(fact, "ns.fact", WriteMode.Overwrite,
      partitionBy = Seq("bucket(8, k)"))
    (cat, cat.table("ns.fact"))
  }

  test("pruned join equals the plain join and reads fewer files") {
    val (_, fact) = fresh()
    val dim = Seq((3L, "a"), (7L, "b")).toDF("dk", "tag")
    val pruned = RuntimeFilter.prunedJoin(fact, "k", dim, "dk")
    val plain = fact.read(None).join(dim, col("k") === col("dk"))
    assert(pruned.select($"id", $"k", $"v", $"dk", $"tag").collect().toSet ===
      plain.select($"id", $"k", $"v", $"dk", $"tag").collect().toSet)
    // two keys land in at most two of the 8 hidden buckets — the scan
    // must list only those buckets' files
    val prunedFiles = filesRead(
      RuntimeFilter.prunedJoin(fact, "k", dim, "dk"))
    val allFiles = filesRead(fact.read(None))
    assert(prunedFiles < allFiles,
      s"expected file pruning: read $prunedFiles of $allFiles files")
  }

  test("key set over the cap switches to the bloom tier, same answer") {
    val (_, fact) = fresh()
    // 20 of the fact's 40 key values — over the cap, selective enough
    // for the bloom to matter
    val dim = (0L until 20L).map(i => (i, s"t$i")).toDF("dk", "tag")
    val pruned = RuntimeFilter.prunedJoin(fact, "k", dim, "dk", cap = 10)
    val plain = fact.read(None).join(dim, col("k") === col("dk"))
    assert(pruned.select($"id", $"dk").collect().toSet ===
      plain.select($"id", col("dk")).collect().toSet)
    // the probe really is in the plan, inside the scan-side stage
    val phys = pruned.queryExecution.executedPlan.toString
    assert(phys.contains("bloom_might_contain"), phys.take(2000))
  }

  test("bloom probe: no false negatives, few false positives, codegen + interpreted agree") {
    import graft.functions.BloomFunctions.bloom_might_contain
    val keys = (0L until 500L).map(i => i * 3L).toDF("k")
    val bloom = keys.stat.bloomFilter("k", 500L, 0.01)
    val bos = new java.io.ByteArrayOutputStream(); bloom.writeTo(bos)
    val bits = bos.toByteArray
    val probe = (0L until 3000L).toDF("v")
      .select($"v", bloom_might_contain($"v", bits).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // every inserted key passes (bloom contract: no false negatives)
    (0L until 500L).map(_ * 3L).foreach(k => assert(probe(k), s"false negative on $k"))
    // non-members overwhelmingly rejected at fpp 1%
    val nonMembers = (0L until 3000L).filterNot(v => v % 3 == 0 && v / 3 < 500)
    val falsePos = nonMembers.count(probe)
    assert(falsePos < nonMembers.size / 10,
      s"$falsePos false positives of ${nonMembers.size}")
    // interpreted eval path (no codegen) matches
    import graft.functions.BloomMightContainExpr
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = BloomMightContainExpr(Literal(42L), bits)
    assert(e.eval(null) === bloom.mightContainLong(42L))
  }

  test("over-cap keys still prune files through their min/max range summary") {
    val cat = new LakeCatalog(spark, Files.createTempDirectory("rf-r-").toString)
    def chunk(lo: Long, hi: Long) =
      (lo until hi).map(i => (i, i, i * 1.0)).toDF("id", "k", "v")
    cat.write(chunk(0, 2000), "ns.rfact", WriteMode.Overwrite,
      statsBy = Seq("k"))
    val t = cat.table("ns.rfact")
    t.write(chunk(2000, 4000), WriteMode.Append, statsBy = Seq("k"))
    t.write(chunk(4000, 6000), WriteMode.Append, statsBy = Seq("k"))
    // 1200 distinct keys — over the cap — but all inside the middle
    // chunk's [2000, 4000) range: the key set's min/max summary must
    // skip the other chunks' files even though no In can be pushed
    val dim = (2100L until 3300L).map(k => (k, s"t$k")).toDF("dk", "tag")
    val pruned = RuntimeFilter.prunedJoin(t, "k", dim, "dk")
    val plain = t.read(None).join(dim, col("k") === col("dk"))
    assert(pruned.select($"id", $"dk").collect().toSet ===
      plain.select($"id", col("dk")).collect().toSet)
    val prunedFiles = filesRead(RuntimeFilter.prunedJoin(t, "k", dim, "dk"))
    val allFiles = filesRead(t.read(None))
    assert(prunedFiles < allFiles,
      s"range summary should skip files: read $prunedFiles of $allFiles")
  }

  test("bloom tier works for string keys") {
    val cat = new LakeCatalog(spark, Files.createTempDirectory("rf-s-").toString)
    val fact = (0 until 300).map(i => (s"u${i % 30}", i.toDouble)).toDF("k", "v")
    cat.write(fact, "ns.sfact", WriteMode.Overwrite)
    val t = cat.table("ns.sfact")
    val dim = (0 until 12).map(i => (s"u$i", i)).toDF("dk", "r")
    val pruned = RuntimeFilter.prunedJoin(t, "k", dim, "dk", cap = 5)
    val plain = t.read(None).join(dim, col("k") === col("dk"))
    assert(pruned.select($"k", $"v", $"r").collect().toSet ===
      plain.select(col("k"), col("v"), col("r")).collect().toSet)
    assert(pruned.queryExecution.executedPlan.toString
      .contains("bloom_might_contain"))
  }

  test("empty dim short-circuits to zero rows and zero files read") {
    val (_, fact) = fresh()
    val dim = Seq.empty[(Long, String)].toDF("dk", "tag")
    val pruned = RuntimeFilter.prunedJoin(fact, "k", dim, "dk")
    assert(pruned.count() === 0L)
    assert(filesRead(pruned) === 0L, "empty key set must not touch the fact")
  }

  test("mismatched key types skip the summary tiers but stay exact") {
    val (_, fact) = fresh() // fact key k is LongType
    // over-cap dim with an IntegerType key: a narrowing range cast
    // could wrap, so the helper must take the plain-join tier — and
    // still produce the exact join result
    val dim = (0 until 20).map(i => (i, s"t$i")).toDF("dk", "tag")
    val pruned = RuntimeFilter.prunedJoin(fact, "k", dim, "dk", cap = 10)
    val plain = fact.read(None).join(dim, col("k") === col("dk"))
    assert(pruned.select($"id", $"dk").collect().toSet ===
      plain.select($"id", col("dk")).collect().toSet)
    assert(!pruned.queryExecution.executedPlan.toString
      .contains("bloom_might_contain"))
    // under the cap the In tier is safe cross-typed (wrapping can only
    // retain junk the join discards, never exclude a match)
    val small = Seq((3, "a"), (7, "b")).toDF("dk", "tag")
    val prunedSmall = RuntimeFilter.prunedJoin(fact, "k", small, "dk")
    val plainSmall = fact.read(None).join(small, col("k") === col("dk"))
    assert(prunedSmall.select($"id", $"dk").collect().toSet ===
      plainSmall.select($"id", col("dk")).collect().toSet)
  }

  test("version pin: the pruned join reads the named snapshot, not HEAD") {
    val (_, fact) = fresh()
    val v1 = fact.latest.get.version
    fact.write(Seq((9999L, 3L, 42.0)).toDF("id", "k", "v"), WriteMode.Append)
    val dim = Seq((3L, "a")).toDF("dk", "tag")
    val atV1 = RuntimeFilter.prunedJoin(fact, "k", dim, "dk", version = Some(v1))
    assert(!atV1.select($"id").as[Long].collect().contains(9999L))
    val atHead = RuntimeFilter.prunedJoin(fact, "k", dim, "dk")
    assert(atHead.select($"id").as[Long].collect().contains(9999L))
  }

  test("null dim keys are dropped, matching inner-join semantics") {
    val (_, fact) = fresh()
    val dim = Seq((Some(5L), "x"), (Option.empty[Long], "nullrow"))
      .toDF("dk", "tag")
    val pruned = RuntimeFilter.prunedJoin(fact, "k", dim, "dk")
    val plain = fact.read(None).join(dim, col("k") === col("dk"))
    assert(pruned.select($"id", $"dk", $"tag").collect().toSet ===
      plain.select($"id", col("dk"), col("tag")).collect().toSet)
    assert(!pruned.select($"tag").as[String].collect().contains("nullrow"))
  }
}
