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
    */
  def forget(cat: LakeCatalog, targets: Seq[(String, String)],
             keys: Seq[Any]): Seq[ErasureResult] = {
    require(keys.nonEmpty, "empty erasure request")
    targets.map { case (ident, keyCol) =>
      val t = cat.table(ident)
      val anchors = t.tags.map("tag " + _._1) ++ t.branches.map("branch " + _._1)
      require(anchors.isEmpty,
        s"'$ident' has retention anchors (${anchors.mkString(", ")}) that " +
          "would pin the subject's data through expiry — drop them first")
      val cond = col(keyCol).isin(keys: _*)
      val before = t.read().where(cond).count()
      val snap = LakeDml.delete(t, cond, strategy = DmlStrategy.CopyOnWrite)
      val (expired, dirsFromExpiry) =
        t.expireSnapshotsOlderThan(System.currentTimeMillis() + 1)
      val orphans = t.removeOrphanFiles(graceMs = 0L)
      ErasureResult(ident, before, snap.version, expired,
        dirsFromExpiry + orphans, residualRows = residual(t, keyCol, keys))
    }
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
    if (dirs.isEmpty) return 0L
    t.read().schema.find(_.name == keyCol) match {
      case None => 0L
      case Some(field) =>
        spark.read
          .schema(org.apache.spark.sql.types.StructType(Seq(field.copy(nullable = true))))
          .parquet(dirs: _*)
          .where(col(keyCol).isin(keys: _*)).count()
    }
  }
}
