package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Right-to-be-forgotten erasure across lake tables.
  *
  * A GDPR/CCPA deletion request must remove a subject's rows from
  * STORAGE, not just from the current snapshot: a merge-on-read delete
  * leaves the bytes in the old data files, and time travel keeps every
  * prior snapshot readable. [[forget]] therefore composes the three
  * primitives that together give physical erasure:
  *
  *  1. copy-on-write DELETE per table ([[LakeDml.delete]] forced to
  *     `CopyOnWrite`) — surviving rows rewrite into fresh files, so no
  *     NEW file contains the subject;
  *  2. full history expiry ([[LakeTable.expireSnapshotsOlderThan]])
  *     — prior snapshots stop being readable and their manifests drop;
  *  3. orphan sweep ([[LakeTable.removeOrphanFiles]] with zero grace)
  *     — the now-unreferenced old files (data, positional AND equality
  *     delete files — equality deletes store key VALUES, which are
  *     themselves personal data) leave the filesystem.
  *
  * Then it VERIFIES: every parquet file still under the table's data
  * root is scanned for the keys and the residual count is reported —
  * the auditor's number, measured from storage rather than inferred
  * from metadata.
  *
  * Tags and branches are retention anchors by design
  * ([[LakeTable.expireSnapshots]] flows around them), which means they
  * would silently PIN the subject's data; `forget` fails loud when any
  * exist instead of reporting an erasure it did not perform. Erasure
  * batches are legally bounded (a deletion request names subjects, not
  * corpora), so `keys` rides the DELETE as an `isin` literal — file
  * skipping prunes untouched files and the rewrite cost is bounded by
  * the files the subject actually occupies.
  */
object Privacy {

  /** Per-table erasure evidence: rows removed, the post-erasure
    * version, how much history was purged, and the storage-level
    * residual (must be 0).
    */
  final case class ErasureResult(ident: String, rowsDeleted: Long,
                                 version: Long, expiredSnapshots: Int,
                                 purgedDirs: Int, residualRows: Long)

  /** Erase `keys` from every (tableIdent, keyColumn) target. Returns
    * one [[ErasureResult]] per target, in input order.
    *
    * Retention anchors are validated for ALL targets before the first
    * delete — erasure is irreversible, so a bad second target must not
    * leave the batch half-applied with the first target's evidence
    * discarded by the throw (ADVICE r9). The orphan sweep is bounded
    * by the erasure start time rather than zero grace: a concurrent
    * committer stages its data dir BEFORE publishing the manifest, and
    * a zero-grace sweep could delete that staged dir and corrupt the
    * racer's commit; sweeping only dirs older than `t0` still removes
    * every pre-erasure residue file (the subject's bytes are by
    * definition older than the request) while never touching a dir
    * written after erasure began.
    */
  def forget(cat: LakeCatalog, targets: Seq[(String, String)],
             keys: Seq[Any]): Seq[ErasureResult] = {
    require(keys.nonEmpty, "empty erasure request")
    val resolved = targets.map { case (ident, keyCol) =>
      (ident, keyCol, cat.table(ident))
    }
    eraseAll(resolved, keys)
  }

  /** Cascade erasure into the AT-INGEST dedup index state under
    * `workDir` ([[graft.ops.IncrementalDedup]] /
    * [[graft.ops.IncrementalSemDedup]]): the subject's document ids —
    * and for the semantic index their EMBEDDING VECTORS, which are
    * content-derived personal data — live on in `bands/`, `shingles/`,
    * `buckets/`, `vecs/`, and `drops/` after the corpus tables are
    * scrubbed. Erases rows keyed by the subject's ids from every index
    * table present, with the same COW-delete + history-expiry +
    * orphan-sweep + storage-audit contract as [[forget]].
    *
    * Safe for the index semantics: deleting the subject's OWN rows
    * never changes another document's verdict (tombstones for other
    * documents keep their own ids), the COW rewrite preserves the
    * `bk`-bucketed layout ([[LakeDml.delete]] rewrites under
    * `base.partitionBy`), and the `graft.dedup.batch` idempotency
    * marker survives because it is carry-forward meta.
    */
  def forgetDedupIndex(spark: org.apache.spark.sql.SparkSession,
                       workDir: java.nio.file.Path,
                       keys: Seq[Any]): Seq[ErasureResult] = {
    require(keys.nonEmpty, "empty erasure request")
    val targets = IndexTableNames.flatMap { name =>
      val t = new LakeTable(spark, workDir.resolve(name).toString)
      if (t.latest.isDefined) Some((name, "id", t)) else None
    }
    // fail loud on an empty work dir: a typo'd path would otherwise
    // report the cascade as trivially complete while the real index
    // still holds the subject (same contract as forgetCatalog)
    require(targets.nonEmpty,
      s"no at-ingest index tables under $workDir — wrong work dir?")
    eraseAll(targets, keys)
  }

  /** Index table layouts the at-ingest families maintain, all keyed
    * by document/vector `id`: the MinHash index (bands/shingles), the
    * semantic index (buckets/vecs), their shared tombstones (drops),
    * and the contamination screen's per-doc flags. (`benchgrams/`
    * holds only benchmark eval grams — no subject data — and is
    * deliberately NOT erased.)
    */
  private[graft] val IndexTableNames: Seq[String] =
    Seq("bands", "shingles", "drops", "buckets", "vecs", "flags")

  /** Catalog-wide erasure with DERIVED-TABLE discovery: erase `keys`
    * from EVERY table in the catalog whose current schema carries
    * `keyCol` — the base tables AND the subject-keyed derived state a
    * per-table request forgets about (an [[IncrementalView]] rollup
    * keyed by the subject still holds one row per erased user;
    * "delete the user from events" quietly leaves their aggregate
    * behind). Anchors pre-validate across the whole discovered set
    * before the first delete. A later refresh of an erased view stays
    * consistent: the base CoW delete is a rewrite commit, which the
    * view's incremental path detects and answers with a full rebuild
    * from the scrubbed source.
    *
    * Schema-name discovery is deliberately aggressive — under a
    * deletion request, ANY table carrying rows keyed by the subject
    * column must be scrubbed; pass `exclude` for tables where the
    * name collides with a non-subject meaning.
    */
  def forgetCatalog(cat: LakeCatalog, keyCol: String, keys: Seq[Any],
                    exclude: Seq[String] = Nil): Seq[ErasureResult] = {
    require(keys.nonEmpty, "empty erasure request")
    // discovery matches the way Spark resolves columns: CASE-
    // INSENSITIVE — a legacy table cased `UID` still holds the
    // subject and must not be silently skipped. Each target erases
    // under its OWN spelling of the column.
    val targets = cat.listTables()
      .filterNot(exclude.contains)
      .flatMap { id =>
        val t = cat.table(id)
        t.latest.flatMap(_.schema.find(_.name.equalsIgnoreCase(keyCol)))
          .map(f => (id, f.name, t))
      }
    require(targets.nonEmpty,
      s"no table in ${cat.warehouse} carries key column '$keyCol'")
    // key typing must be UNIFORM across the discovered set: applying
    // e.g. bigint keys to a string-typed column makes Spark coerce
    // the COLUMN, and '042' matches a request for 42 — over-deleting
    // a different subject (the ADVICE-r9 single-table bug, catalog
    // edition). Integral widths may mix (lossless widening); a
    // string/numeric mix is ambiguous and fails loud.
    val kinds = targets.map { case (id, c, t) =>
      val dt = t.latest.get.schema(c).dataType
      import org.apache.spark.sql.types._
      val kind = dt match {
        case LongType | IntegerType | ShortType | ByteType => "integral"
        case StringType => "string"
        case other => s"unsupported($other)"
      }
      (id, kind)
    }
    require(kinds.map(_._2).distinct.size == 1 &&
        !kinds.head._2.startsWith("unsupported"),
      s"key column '$keyCol' has mixed/unsupported types across the catalog " +
        s"(${kinds.map { case (id, k) => s"$id:$k" }.mkString(", ")}) — " +
        "erasing with one key type would coerce columns and risk matching " +
        "the wrong subject; erase per table with typed keys instead")
    eraseAll(targets, keys)
  }

  /** Cascade erasure into a BITMAP SEGMENT store
    * ([[graft.ops.BitmapSegments]]): the subject's ids live on as BITS
    * inside every segment's Roaring bitmap — derived state a row-level
    * DELETE cannot reach, because the subject has no row of its own.
    * Every segment intersecting the keys is rewritten with
    * `bitmap64_remove` (exact ANDNOT — no rebuild from raw events,
    * which may already be scrubbed), then history expires, old files
    * sweep, and the residual audit re-reads every parquet file still
    * on disk and intersects its bitmaps with the keys: 0 = no bit of
    * the subject remains.
    *
    * `rowsDeleted` in the result counts segment ROWS scrubbed (rows
    * that contained at least one subject id); segments emptied by the
    * removal stay as empty segments — the slice legitimately has zero
    * members now. Cost: the keys ride as ONE broadcast bitmap literal,
    * the rewrite is bounded by the files whose segments intersect it,
    * and nothing ever re-scans the fact table.
    */
  def forgetSegments(segTbl: LakeTable, keys: Seq[Long],
                     bmCol: String = "bm"): ErasureResult = {
    import graft.functions.{BitmapFunctions => BF, BitmapOps}
    require(keys.nonEmpty, "empty erasure request")
    val anchors = segTbl.tags.map("tag " + _._1) ++ segTbl.branches.map("branch " + _._1)
    require(anchors.isEmpty,
      s"segment store has retention anchors (${anchors.mkString(", ")}) that " +
        "would pin the subject's data through expiry — drop them first")
    require(segTbl.read().schema.exists(_.name == bmCol),
      s"segment column '$bmCol' not in ${segTbl.rootLocation}'s schema")
    val keyBm = {
      val bm = new org.roaringbitmap.longlong.Roaring64Bitmap()
      keys.foreach(bm.addLong)
      lit(BitmapOps.toBytes(bm))
    }
    val hit = BF.bitmap64_and_count(col(bmCol), keyBm) > 0
    val t0 = System.currentTimeMillis()
    val before = segTbl.read().where(hit).count()
    val snap = LakeDml.update(segTbl, hit,
      Map(bmCol -> BF.bitmap64_remove(col(bmCol), keyBm)),
      strategy = DmlStrategy.CopyOnWrite)
    val (expired, dirsFromExpiry) =
      segTbl.expireSnapshotsOlderThan(System.currentTimeMillis() + 1)
    val orphans =
      segTbl.removeOrphanFiles(graceMs = math.max(0L, System.currentTimeMillis() - t0))
    ErasureResult(segTbl.rootLocation, before, snap.version, expired,
      dirsFromExpiry + orphans,
      residualRows = segmentResidual(segTbl, keyBm, bmCol))
  }

  /** Storage-level audit for segment stores: rows whose bitmap still
    * intersects the keys, across every parquet file under the data
    * roots (referenced or not). 0 = no subject bit remains.
    */
  private[lake] def segmentResidual(t: LakeTable, keyBm: org.apache.spark.sql.Column,
                                    bmCol: String): Long = {
    import graft.functions.{BitmapFunctions => BF}
    val dirs = Seq("data", "eqdeletes").flatMap { sub =>
      try t.io.list(t.loc(sub)).map(_.getPath.toString)
      catch { case _: Exception => Nil }
    }
    if (dirs.isEmpty) return 0L
    t.spark.read
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(bmCol,
          org.apache.spark.sql.types.BinaryType, nullable = true))))
      .parquet(dirs: _*)
      .where(col(bmCol).isNotNull && BF.bitmap64_and_count(col(bmCol), keyBm) > 0)
      .count()
  }

  private def eraseAll(targets: Seq[(String, String, LakeTable)],
                       keys: Seq[Any]): Seq[ErasureResult] = {
    // validate retention anchors for ALL targets BEFORE the first
    // delete — erasure is irreversible, so a bad later target must
    // not leave the batch half-applied with the completed targets'
    // evidence discarded by the throw (ADVICE r9)
    targets.foreach { case (ident, _, t) =>
      val anchors = t.tags.map("tag " + _._1) ++ t.branches.map("branch " + _._1)
      require(anchors.isEmpty,
        s"'$ident' has retention anchors (${anchors.mkString(", ")}) that " +
          "would pin the subject's data through expiry — drop them first")
    }
    val t0 = System.currentTimeMillis()
    def eraseOne(ident: String, keyCol: String, t: LakeTable): ErasureResult = {
      val cond = col(keyCol).isin(keys: _*)
      val before = t.read().where(cond).count()
      val snap = LakeDml.delete(t, cond, strategy = DmlStrategy.CopyOnWrite)
      val (expired, dirsFromExpiry) =
        t.expireSnapshotsOlderThan(System.currentTimeMillis() + 1)
      // sweep bounded by the erasure start time, not zero grace: a
      // concurrent committer stages its data dir BEFORE publishing its
      // manifest, and a zero-grace sweep could delete that staged dir
      // and corrupt the racer's commit. Everything the subject ever
      // touched predates t0, so the sweep still removes every
      // pre-erasure residue file (ADVICE r9).
      val orphans =
        t.removeOrphanFiles(graceMs = math.max(0L, System.currentTimeMillis() - t0))
      ErasureResult(ident, before, snap.version, expired,
        dirsFromExpiry + orphans, residualRows = residual(t, keyCol, keys))
    }
    // DISTINCT tables run concurrently (disjoint roots, own
    // manifests; each pays several fixed-cost jobs, so batch
    // wall-clock is max-of-tables, not sum); repeated entries for the
    // SAME table — a request erasing two key columns — stay
    // sequential within their table's future (concurrent self-CAS
    // would conflict) and results return in input order
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val indexed = targets.zipWithIndex
    val perTable = indexed.groupBy(_._1._3.rootLocation).values.toSeq
      .map(group => Future(group.map { case ((ident, keyCol, t), i) =>
        i -> eraseOne(ident, keyCol, t)
      }))
    perTable.flatMap(Await.result(_, Duration.Inf)).sortBy(_._1).map(_._2)
  }

  /** Storage-level audit: read every parquet file still present under
    * the table's data/eqdeletes roots (manifest-referenced or not) and
    * count rows matching the keys. 0 = physically erased. ONE
    * column-pruned scan over all dirs — the explicit single-column
    * schema makes files that lack the key column (eq-delete files for
    * other keys) read as nulls instead of failing, and keeps the audit
    * a single Spark job however many dirs a 100 TB table holds.
    */
  private[lake] def residual(t: LakeTable, keyCol: String, keys: Seq[Any]): Long = {
    val spark = t.spark
    val dirs = Seq("data", "eqdeletes").flatMap { sub =>
      try t.io.list(t.loc(sub)).map(_.getPath.toString)
      catch { case _: Exception => Nil }
    }
    // fail loud on a missing key column: residual is a public audit
    // entry point, and "0 rows" from a misspelled/renamed column would
    // report 'physically erased' without scanning a single file
    val field = t.read().schema.find(_.name == keyCol).getOrElse(
      throw new IllegalArgumentException(
        s"audit key column '$keyCol' not in ${t.rootLocation}'s current schema"))
    if (dirs.isEmpty) return 0L
    spark.read
      .schema(org.apache.spark.sql.types.StructType(Seq(field.copy(nullable = true))))
      .parquet(dirs: _*)
      .where(col(keyCol).isin(keys: _*)).count()
  }
}
