package graft.lake

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger
import org.apache.hadoop.fs.{Path => HPath}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Fault-injection coverage for the object-store commit path: the
  * conditional-PUT arbiter must survive exactly the failures S3-style
  * stores produce — duplicate claims, lost responses after a landed
  * write (SDK retry sees 412 for its OWN put), writers dying between
  * claim and manifest, and concurrent publishes. The filesystem
  * stand-in store emulates only the server-side atomic conditional
  * write; nothing here leans on rename or O_EXCL atomicity.
  */
class ConditionalPutArbiterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshStore(): (FsConditionalStore, HPath) = {
    val dir = Files.createTempDirectory("cput-").toString
    val io = new LakeIo(new HPath(dir).getFileSystem(spark.sessionState.newHadoopConf()))
    (new FsConditionalStore(io), io.qualify(new HPath(dir)))
  }

  /** Applies the write, then reports transport failure — the
    * lost-response case. One-shot per arm.
    */
  private final class LossyStore(inner: ConditionalStore) extends ConditionalStore {
    @volatile var dropNextResponse = false
    def putIfAbsent(key: HPath, content: Array[Byte]): Boolean = {
      val r = inner.putIfAbsent(key, content)
      if (dropNextResponse && r) {
        dropNextResponse = false
        throw new java.io.IOException("simulated: response lost after landed PUT")
      }
      r
    }
    def get(key: HPath): Option[Array[Byte]] = inner.get(key)
    def delete(key: HPath): Unit = inner.delete(key)
    def mtimeMs(key: HPath): Option[Long] = inner.mtimeMs(key)
  }

  test("duplicate claim: N racing writers, exactly one wins") {
    val (store, root) = freshStore()
    val claim = new HPath(root, "_versions/v00000002.claim")
    val wins = new AtomicInteger(0)
    val threads = (1 to 8).map { _ =>
      new Thread(() => {
        if (new ConditionalPutCommitArbiter(store).tryClaim(claim)) wins.incrementAndGet()
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(wins.get() === 1)
  }

  test("lost response after a landed claim PUT: retry resolves ownership, not loss") {
    val (store, root) = freshStore()
    val lossy = new LossyStore(store)
    val a = new ConditionalPutCommitArbiter(lossy)
    val b = new ConditionalPutCommitArbiter(store)
    val claim = new HPath(root, "_versions/v00000003.claim")
    lossy.dropNextResponse = true
    assert(a.tryClaim(claim), "own landed PUT must resolve to success on retry")
    assert(!b.tryClaim(claim), "a competitor must still see the claim as taken")
  }

  test("concurrent publish of different manifests: exactly one lands, bytes intact") {
    val (store, root) = freshStore()
    val manifest = new HPath(root, "_versions/v00000002.json")
    val contents = (1 to 6).map(i => s"""{"writer":$i}""")
    val results = new java.util.concurrent.ConcurrentHashMap[String, Boolean]()
    val threads = contents.map { c =>
      new Thread(() => {
        results.put(c, new ConditionalPutCommitArbiter(store).publishIfAbsent(manifest, c))
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val winners = contents.filter(results.get(_))
    assert(winners.size === 1)
    assert(store.get(manifest).map(new String(_, "UTF-8")) === Some(winners.head))
  }

  test("lost response after a landed publish: idempotent success, no double commit") {
    val (store, root) = freshStore()
    val lossy = new LossyStore(store)
    val a = new ConditionalPutCommitArbiter(lossy)
    val manifest = new HPath(root, "_versions/v00000005.json")
    lossy.dropNextResponse = true
    assert(a.publishIfAbsent(manifest, """{"mine":true}"""))
    // the competitor's differing content is correctly refused
    assert(!new ConditionalPutCommitArbiter(store).publishIfAbsent(manifest, """{"other":1}"""))
    assert(store.get(manifest).map(new String(_, "UTF-8")) === Some("""{"mine":true}"""))
  }

  test("writer dies between claim and manifest: successor reclaims the stale claim") {
    sys.props("graft.lake.forceConditionalPutArbiter") = "true"
    sys.props("graft.lake.staleClaimMs") = "50"
    try {
      val cat = new LakeCatalog(spark, Files.createTempDirectory("cput-lake-").toString)
      cat.write(Seq((1L, 1.0)).toDF("id", "v"), "ns.t", WriteMode.Overwrite)
      val t = cat.table("ns.t")
      // a writer claims v2 and dies before publishing anything
      val deadClaim = new HPath(new HPath(t.rootLocation), "_versions/v00000002.claim")
      assert(t.arbiter.tryClaim(deadClaim))
      Thread.sleep(80) // let the claim cross the stale horizon
      val snap = cat.write(Seq((2L, 2.0)).toDF("id", "v"), "ns.t", WriteMode.Append)
      assert(snap.version === 2L)
      assert(cat.read("ns.t").count() === 2)
    } finally {
      sys.props.remove("graft.lake.forceConditionalPutArbiter")
      sys.props.remove("graft.lake.staleClaimMs")
    }
  }

  test("end-to-end through the conditional-PUT arbiter: concurrent appends, DML, time travel") {
    sys.props("graft.lake.forceConditionalPutArbiter") = "true"
    try {
      val cat = new LakeCatalog(spark, Files.createTempDirectory("cput-e2e-").toString)
      val sample = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("id", "name", "v")
      cat.write(sample, "ns.t", WriteMode.Overwrite)
      val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (1 to 4).map { _ =>
        new Thread(() => {
          try cat.write(sample, "ns.t", WriteMode.Append)
          catch { case t: Throwable => errors.add(t) }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(errors.isEmpty, s"append thread failed: ${errors.peek()}")
      assert(cat.read("ns.t").count() === 15)
      assert(cat.table("ns.t").history.map(_.version) === (1L to 5L))
      // row-level DML and time travel ride the same commit path
      LakeDml.delete(cat.table("ns.t"), col("id") === 2L)
      assert(cat.read("ns.t").count() === 10)
      assert(cat.read("ns.t", Some(5L)).count() === 15)
    } finally sys.props.remove("graft.lake.forceConditionalPutArbiter")
  }
}
