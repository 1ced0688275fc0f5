package graft.lake

import java.nio.file.{Files, Path, StandardOpenOption}

/** Mutual exclusion between an at-ingest work dir's two writers: the
  * ingest scaffold ([[graft.ops.IncrementalDedup.ingestLoop]] — slice
  * writes, the leftover sweep, and every foreachBatch trigger) and the
  * erasure cascade ([[Privacy.forgetDedupIndex]] — index COW rewrites
  * plus the IN-PLACE arrivals rewrite).
  *
  * Why a lock and not ordering: the arrivals rewrite swaps a slice's
  * bytes under its original path, which is atomic per rename — but a
  * trigger that OPENED the file before the rename reads pre-erasure
  * bytes and may commit the subject's index rows AFTER the cascade's
  * final scrub, a silent-retention window no rewrite ordering closes.
  * Holding the lock for the duration of each trigger and of the whole
  * cascade means an erasure only ever runs BETWEEN triggers: slices
  * already consumed are scrubbed from the index by the cascade, slices
  * not yet consumed are rewritten before any reader opens them.
  *
  * Two layers, both needed: a per-path JVM monitor serializes threads
  * in one process (same-process `FileLock`s would throw
  * `OverlappingFileLockException` instead of waiting), and an OS file
  * lock on `_maintenance.lock` serializes across processes (a
  * cross-process erasure blocks until the other side's trigger
  * finishes). Reentrant per thread, so an erasure issued from INSIDE a
  * trigger callback (tests; synchronous admin hooks) does not
  * self-deadlock. The lock FILE persists in the work dir — the
  * underscore name keeps it invisible to the `arrivals/<asterisk>/<asterisk>` glob
  * and to parquet readers.
  *
  * At 100 TB the coarseness is right: erasure is a rare admin
  * operation and waits at most one trigger; triggers pay one
  * uncontended lock per micro-batch, which is noise next to any
  * commit.
  */
private[graft] object WorkDirLock {
  private final class Guard { @volatile var holder: Thread = _ }
  private val guards =
    new java.util.concurrent.ConcurrentHashMap[String, Guard]()

  def withLock[T](workDir: Path)(f: => T): T = {
    val g = guards.computeIfAbsent(
      workDir.toAbsolutePath.normalize.toString, _ => new Guard)
    if (g.holder eq Thread.currentThread()) f // reentrant
    else g.synchronized {
      Files.createDirectories(workDir)
      val ch = java.nio.channels.FileChannel.open(
        workDir.resolve("_maintenance.lock"),
        StandardOpenOption.CREATE, StandardOpenOption.WRITE)
      try {
        val fl = ch.lock() // blocks on a concurrent PROCESS's hold
        g.holder = Thread.currentThread()
        try f finally { g.holder = null; fl.release() }
      } finally ch.close()
    }
  }
}
