package graft.lake

import org.apache.spark.sql.DataFrame

/** Multi-statement, multi-table transaction over lake tables — the
  * bronze→silver→gold publish shape (the reference pipeline commits
  * its three layers as separate Iceberg writes,
  * `/root/reference/dags/etl.py:98-103`, so a mid-pipeline failure
  * leaves silver ahead of gold; this closes that gap).
  *
  * Protocol (two-phase over the staged-commit machinery):
  *
  *  1. '''Stage''' — every [[write]] lands its data immediately as an
  *     invisible staged commit ([[LakeTable.stageWrite]]) and records
  *     the table version it was planned against. All the heavy I/O
  *     happens here, outside any critical section, and no reader can
  *     observe it.
  *  2. '''Commit''' — [[commit]] publishes each staged write
  *     metadata-only, CAS-guarded on the recorded base version
  *     (`expectedBase` → conditional-PUT under the arbiter). A
  *     concurrent commit to ANY written table since its stage point
  *     fails the transaction. On failure, tables already published by
  *     this transaction are rolled back to their pre-transaction
  *     versions ([[LakeTable.rollbackTo]] — a metadata-only
  *     re-commit) and the unpublished staged writes are discarded, so
  *     the final state is all-or-nothing.
  *
  * Isolation note, honestly stated: without a catalog-level pointer
  * there is no single atom covering several tables (Iceberg has the
  * same limit short of a Nessie-style catalog), so a reader racing
  * the commit window can observe table A at its new version before
  * table B publishes. The window is metadata-sized — microseconds of
  * JSON PUTs, not the data write — and the FAILURE guarantee is
  * strict: no committed-forever partial state. Rollback keeps history
  * immutable (the transient versions stay time-travel-readable until
  * expiry), so even the race window is auditable.
  *
  * Scale: staging is the same distributed write path as a direct
  * `write()` (sort-order clustering, bloom sidecars, footer stats all
  * apply); commit touches only manifests. A 100-table transaction
  * costs 100 conditional PUTs at publish time.
  */
final class LakeTransaction private[lake] (val cat: LakeCatalog) {

  private final case class Pending(ident: String, table: LakeTable,
                                   stagedId: String, expected: Long)
  private val pending = scala.collection.mutable.ArrayBuffer.empty[Pending]
  private var closed = false

  private def open(): Unit =
    require(!closed, "transaction already committed or aborted")

  /** Stage a write into the transaction. Data is written NOW (the
    * expensive part, fully parallel, invisible to readers); the table
    * must already exist — transactions coordinate publishes over
    * established tables, creation is DDL. Returns `this` for
    * chaining.
    */
  def write(df: DataFrame, ident: String,
            mode: WriteMode = WriteMode.Append): LakeTransaction = {
    open()
    val t = cat.table(ident)
    val base = t.latest.getOrElse(throw new IllegalStateException(
      s"transaction write to missing table '$ident' — create it first"))
    val id = t.stageWrite(df, mode)
    // several writes to one table publish in sequence: the first
    // expects the stage-time base, each later one expects its
    // predecessor's result (tracked at publish below)
    val expected = pending.reverse.find(_.ident == ident)
      .map(_.expected).getOrElse(base.version)
    pending += Pending(ident, t, id, expected)
    this
  }

  /** Publish every staged write, in write order. Returns the new
    * snapshot per statement (ident → snapshot, last write wins per
    * table). Throws on conflict or failure — after rolling every
    * already-published table back to its pre-transaction version and
    * discarding unpublished staged data.
    */
  def commit(): Map[String, Snapshot] = {
    open(); closed = true
    var published = List.empty[(Pending, Long)] // with pre-publish version
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Snapshot]
    try {
      var bumped = Map.empty[String, Long] // ident → version this txn advanced it to
      pending.foreach { p =>
        val expect = bumped.getOrElse(p.ident, p.expected)
        val pre = p.table.latest.map(_.version).getOrElse(
          throw new IllegalStateException(s"table '${p.ident}' vanished mid-transaction"))
        val snap = p.table.publishStaged(p.stagedId, expectedBase = Some(expect))
        published ::= (p, pre)
        bumped += p.ident -> snap.version
        out(p.ident) = snap
      }
      out.toMap
    } catch {
      case e: Throwable =>
        // unwind newest-first so each rollback CAS-lands on the state
        // this transaction left; a rollback that itself loses a race
        // is reported, not swallowed
        val undo = published.flatMap { case (p, pre) =>
          scala.util.Try(p.table.rollbackTo(pre)).failed.toOption
            .map(t => s"${p.ident}: ${t.getMessage}")
        }
        pending.filterNot(p => published.exists(_._1 eq p))
          .foreach(p => scala.util.Try(p.table.discardStaged(p.stagedId)))
        if (undo.nonEmpty) throw new IllegalStateException(
          s"transaction failed AND rollback failed for ${undo.mkString("; ")}", e)
        throw e
    }
  }

  /** Drop every staged write — data dirs and staged manifests. */
  def abort(): Unit = {
    open(); closed = true
    pending.foreach(p => scala.util.Try(p.table.discardStaged(p.stagedId)))
  }
}
