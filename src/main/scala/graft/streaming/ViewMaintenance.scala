package graft.streaming

import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.lake.{IncrementalView, LakeCatalog}

/** Continuous maintenance for incrementally-maintained materialized
  * views ([[graft.lake.IncrementalView]]): the gold aggregate stays
  * fresh as the silver source commits, without a scheduler in the
  * loop — the streaming face of `CALL graft.system.refresh_view`.
  *
  * Mechanics: the source's committed-commit stream
  * ([[StreamingLakeSource.committedStream]]) is used purely as a
  * TRIGGER — each micro-batch marks "the source moved"; the batch
  * rows themselves are discarded and [[IncrementalView.refresh]]
  * reads its own changelog span from the view's recorded source
  * version to the current snapshot. That makes maintenance:
  *
  *  - exactly-once without sink-side dedup: refresh is CAS-guarded on
  *    the view's base version and records the reflected source
  *    version in commit meta, so a replayed trigger (restart, retry)
  *    is a no-op rather than a double-apply;
  *  - per-trigger bounded: `maxCommitsPerTrigger` paces how much
  *    source history each refresh folds (admission control composes —
  *    a backlogged view catches up in bounded steps, not one giant
  *    MERGE);
  *  - rewrite-tolerant: dir-removing source commits (overwrite, COW
  *    DML, rollback) tick through (`skipRewriteCommits=true`) and
  *    refresh notices the missing changelog itself, falling back to a
  *    full rebuild — the stream never wedges.
  *
  * At 100 TB this is the difference between "gold is a nightly full
  * recompute" and "gold lags silver by one trigger interval at
  * O(changed data) cost".
  */
object ViewMaintenance {

  /** Start a maintenance stream for `viewIdent` over `sourceIdent`.
    * First trigger builds the view full if absent. `aggSpecs` are the
    * serializable SQL-string form (`count(*) AS cnt`, `sum(x) AS s`);
    * the definition is persisted in view meta, so later runs — or a
    * plain `CALL graft.system.refresh_view` — can omit rediscovering
    * it.
    */
  def maintain(cat: LakeCatalog, sourceIdent: String, viewIdent: String,
               keys: Seq[String], aggSpecs: Seq[String],
               checkpoint: String,
               trigger: Trigger = Trigger.AvailableNow(),
               maxCommitsPerTrigger: Option[Int] = None): StreamingQuery = {
    // parse eagerly: a bad spec fails at start(), not mid-stream
    IncrementalView.parseAggs(aggSpecs)
    val src = cat.table(sourceIdent)
    StreamingLakeSource
      .committedStream(src, maxCommitsPerTrigger, skipRewriteCommits = true)
      .writeStream
      .queryName(s"maintain $viewIdent")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (_: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        // the batch is only a tick; refresh reads its own changelog
        graft.ProfStream.prof(s"vm refresh $viewIdent") {
          IncrementalView.refreshSql(cat, sourceIdent, viewIdent, keys, aggSpecs)
        }
        ()
      }
      .start()
  }

  /** Continuous maintenance for an incrementally-maintained JOIN view
    * ([[graft.lake.JoinView]]): TWO tick streams — one per source —
    * each firing the same CAS-guarded refresh, so the view follows
    * whichever side commits. A refresh that loses the CAS race to its
    * sibling re-runs rather than dropping the tick: the winner may
    * have read source versions from before this tick's commit, and
    * the re-run is a cheap version-compare no-op whenever it did not.
    */
  def maintainJoin(cat: LakeCatalog, factIdent: String, dimIdent: String,
                   viewIdent: String, factKey: String, joinKey: String,
                   dimKey: String, dimCols: Seq[String],
                   checkpointFact: String, checkpointDim: String,
                   trigger: Trigger = Trigger.AvailableNow(),
                   maxCommitsPerTrigger: Option[Int] = None)
      : (StreamingQuery, StreamingQuery) = {
    // A CAS loss means a sibling refresh committed concurrently — but
    // the winner may have read source versions BEFORE the commit this
    // tick is reporting, so a dropped tick could leave that commit
    // permanently unreflected (fatal under AvailableNow, where no
    // later trigger will fire). Re-run instead: an already-covered
    // refresh is a version-compare no-op, and every further CAS loss
    // implies some other refresh committed (system-wide progress), so
    // the loop terminates.
    // same-process ticks serialize on this lock: the two sides fire
    // simultaneously under AvailableNow, and without it both run the
    // full refresh concurrently — one wins the CAS and the other
    // re-runs, twice the cluster work for one view generation. With
    // it, the second tick's refresh is a version-compare no-op. The
    // CAS (and the retry loop) still guards cross-process racers.
    val tickLock = new Object
    def tick(src: String): Unit = graft.ProfStream.prof(s"jvs tick $src") {
      tickLock.synchronized {
        var done = false
        while (!done)
          try {
            graft.lake.JoinView.refreshSql(cat, factIdent, dimIdent, viewIdent,
              factKey, joinKey, dimKey, dimCols)
            done = true
          } catch { case _: java.util.ConcurrentModificationException => () }
      }
    }
    def side(srcIdent: String, ckpt: String): StreamingQuery =
      StreamingLakeSource
        .committedStream(cat.table(srcIdent), maxCommitsPerTrigger,
          skipRewriteCommits = true)
        .writeStream
        .queryName(s"maintain-join $viewIdent ($srcIdent)")
        .option("checkpointLocation", ckpt)
        .trigger(trigger)
        .foreachBatch { (_: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          tick(srcIdent)
        }
        .start()
    (side(factIdent, checkpointFact), side(dimIdent, checkpointDim))
  }
}
