package graft.lake

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** CHECK constraints: born-valid declaration, SQL NULL semantics,
  * enforcement across every ingest path (write, upsert, add_files,
  * streaming-style append), survival across overwrite/compact/clone,
  * schema-evolution guards, and drop.
  */
class LakeChecksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh() = {
    val cat = new LakeCatalog(spark, Files.createTempDirectory("check-spec-").toString)
    cat.write(Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "v"),
      "ns.t", WriteMode.Overwrite)
    (cat, cat.table("ns.t"))
  }

  test("add validates existing data; writes reject FALSE rows, NULL passes") {
    val (_, t) = fresh()
    t.addCheckConstraint("v_pos", "v >= 0")
    assert(t.checkConstraints === Map("v_pos" -> "v >= 0"))
    // a constraint the existing data violates cannot be added
    val e = intercept[IllegalArgumentException](t.addCheckConstraint("v_big", "v > 15"))
    assert(e.getMessage.contains("v_big"))
    // violating append rejected, table unchanged
    val bad = Seq((3L, "c", -1.0)).toDF("id", "name", "v")
    intercept[IllegalArgumentException](t.write(bad, WriteMode.Append))
    assert(t.read(None).count() === 2)
    // NULL predicate passes (SQL CHECK semantics)
    t.write(Seq((4L, "d", Option.empty[Double])).toDF("id", "name", "v"),
      WriteMode.Append)
    assert(t.read(None).count() === 3)
    // clean append passes; upsert path enforced too
    t.write(Seq((5L, "e", 5.0)).toDF("id", "name", "v"), WriteMode.Append)
    intercept[IllegalArgumentException](
      t.upsert(Seq((5L, "e", -9.0)).toDF("id", "name", "v"), Seq("id")))
    t.upsert(Seq((5L, "e2", 9.0)).toDF("id", "name", "v"), Seq("id"))
    assert(t.read(None).where($"id" === 5L).head.getString(1) === "e2")
  }

  test("constraints survive overwrite, compact, and clone; drop removes them") {
    val (cat, t) = fresh()
    t.addCheckConstraint("v_pos", "v >= 0")
    // overwrite keeps the constraint AND validates the overwriting batch
    intercept[IllegalArgumentException](
      t.write(Seq((9L, "x", -1.0)).toDF("id", "name", "v"), WriteMode.Overwrite))
    t.write(Seq((9L, "x", 1.0)).toDF("id", "name", "v"), WriteMode.Overwrite)
    assert(t.checkConstraints.contains("v_pos"))
    t.write(Seq((10L, "y", 2.0)).toDF("id", "name", "v"), WriteMode.Append)
    t.compact(targetPartitions = 1)
    assert(t.checkConstraints.contains("v_pos"))
    // clone carries the constraint (meta travels with the manifest)
    cat.cloneTable("ns.t", "ns.fork")
    val fork = cat.table("ns.fork")
    assert(fork.checkConstraints.contains("v_pos"))
    intercept[IllegalArgumentException](
      fork.write(Seq((11L, "z", -3.0)).toDF("id", "name", "v"), WriteMode.Append))
    // drop: writes flow again
    t.dropCheckConstraint("v_pos")
    assert(t.checkConstraints.isEmpty)
    t.write(Seq((11L, "z", -3.0)).toDF("id", "name", "v"), WriteMode.Append)
    assert(t.read(None).count() === 3)
  }

  test("rename/drop of a constrained column is rejected; add_files is validated") {
    val (_, t) = fresh()
    t.addCheckConstraint("v_pos", "v >= 0")
    val er = intercept[IllegalArgumentException](t.renameColumn("v", "val"))
    assert(er.getMessage.contains("v_pos"))
    val ed = intercept[IllegalArgumentException](t.dropColumn("v"))
    assert(ed.getMessage.contains("v_pos"))
    // unconstrained columns still evolve freely
    t.renameColumn("name", "label")
    // add_files: a violating import is refused before any metadata lands
    val src = Files.createTempDirectory("check-import-").toString
    Seq((20L, "m", -5.0)).toDF("id", "label", "v")
      .write.mode("overwrite").parquet(s"$src/batch")
    val before = t.latest.get.version
    intercept[IllegalArgumentException](t.addFiles(s"$src/batch"))
    assert(t.latest.get.version === before)
  }

  test("streaming sink batches are validated: a violating micro-batch fails the stream") {
    val (cat, t) = fresh()
    t.addCheckConstraint("v_pos", "v >= 0")
    val dir = Files.createTempDirectory("check-stream-").toString
    val ckpt = Files.createTempDirectory("check-stream-ck-").toString
    Seq((10L, "ok", 1.0)).toDF("id", "name", "v")
      .coalesce(1).write.parquet(s"$dir/f1")
    Seq((11L, "bad", -1.0)).toDF("id", "name", "v")
      .coalesce(1).write.parquet(s"$dir/f2")
    val sch = spark.read.parquet(s"$dir/f1").schema
    val stream = spark.readStream.schema(sch)
      .option("recursiveFileLookup", "true").parquet(dir)
    val q = graft.streaming.StreamingLakeSink.appendStream(stream, cat, "ns.t", ckpt)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      q.awaitTermination())
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(c => Option(c.getMessage).exists(_.contains("v_pos"))))
    // the violating batch landed nothing
    assert(t.read(None).where($"v" < 0).count() === 0L)
  }

  test("CALL add_check / drop_check round-trip through SQL") {
    val wh = Files.createTempDirectory("check-sql-").toString
    val c = "gchk1"
    spark.conf.set(s"spark.sql.catalog.$c", classOf[sqlcat.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$c.warehouse", wh)
    val cat = new LakeCatalog(spark, wh)
    cat.write(Seq((1L, 5.0)).toDF("id", "v"), "ns.t", WriteMode.Overwrite)
    val v = spark.sql(
      s"CALL $c.system.add_check(table => 'ns.t', name => 'v_pos', predicate => 'v >= 0')")
      .head.getLong(0)
    assert(v === 2L)
    intercept[Exception](spark.sql(s"INSERT INTO $c.ns.t VALUES (2, -1.0)"))
    assert(spark.sql(s"CALL $c.system.drop_check(table => 'ns.t', name => 'v_pos')")
      .head.getLong(0) === 3L)
    spark.sql(s"INSERT INTO $c.ns.t VALUES (2, -1.0)")
    assert(spark.sql(s"SELECT count(*) AS n FROM $c.ns.t").head.getLong(0) === 2L)
  }

  test("merge-on-read DML is constrained too: MOR UPDATE/MERGE reject violating images") {
    val (_, t) = fresh()
    t.addCheckConstraint("v_pos", "v >= 0")
    val before = t.latest.get.version
    // MOR UPDATE writing a violating new row image must fail, not land
    intercept[IllegalArgumentException](LakeDml.update(t, $"id" === 1L,
      Map("v" -> lit(-5.0)), strategy = DmlStrategy.MergeOnRead))
    assert(t.latest.get.version === before)
    assert(t.read(None).where($"v" < 0).count() === 0)
    // MOR MERGE whose matched arm sets a violating value: same gate
    val src = Seq((2L, "b", -7.0)).toDF("id", "name", "v")
    intercept[IllegalArgumentException](LakeDml.merge(t, src, keys = Seq("id"),
      strategy = DmlStrategy.MergeOnRead))
    assert(t.latest.get.version === before)
    // clean MOR DML still flows
    LakeDml.update(t, $"id" === 1L, Map("v" -> lit(5.0)),
      strategy = DmlStrategy.MergeOnRead)
    assert(t.read(None).where($"id" === 1L).head.getDouble(2) === 5.0)
  }

  test("carry-prefixed commit meta survives binpack, scoped, and full compaction") {
    val (_, t) = fresh()
    val k = LakeTable.CarryMetaPrefix + "spec.marker"
    t.write(Seq((3L, "c", 30.0)).toDF("id", "name", "v"), WriteMode.Append,
      meta = Map(k -> "42"))
    assert(t.latest.get.meta(k) === "42")
    t.compactBinPack(maxDirBytes = 1L << 30)
    assert(t.latest.get.meta(k) === "42", "binpack must carry the marker")
    t.compactWhere(Seq(LakePredicate.EqualTo("id", 1L)))
    assert(t.latest.get.meta(k) === "42", "scoped compaction must carry the marker")
    t.compact(targetPartitions = 1)
    assert(t.latest.get.meta(k) === "42", "full rewrite must carry the marker")
  }
}
