package graft.lake

import java.nio.file.{Files, Path, StandardOpenOption}

/** The repo's ONE two-layer filesystem lock: a per-path JVM monitor
  * serializes threads in one process (same-process `FileLock`s would
  * throw `OverlappingFileLockException` instead of waiting), then an
  * OS file lock serializes across processes. Reentrant per thread.
  * Shared by [[WorkDirLock]] (at-ingest work dirs) and
  * [[graft.state.WatermarkStore]] (watermark advance) — the idiom is
  * subtle enough that two drifting copies were a review finding.
  *
  * Keys are canonical (symlink-resolved) paths: two spellings of one
  * lock file must intern the SAME monitor, or both threads open
  * FileLocks on one underlying file and the second gets
  * `OverlappingFileLockException` instead of waiting. Parent dirs are
  * created as a side effect (every caller is about to write there
  * anyway).
  */
private[graft] object FsLock {
  private final class Guard { @volatile var holder: Thread = _ }
  private val guards =
    new java.util.concurrent.ConcurrentHashMap[String, Guard]()

  def withFileLock[T](lockFile: Path)(f: => T): T = {
    val parent = lockFile.toAbsolutePath.getParent
    Files.createDirectories(parent)
    // canonicalize the PARENT (the lock file itself may not exist yet)
    val g = guards.computeIfAbsent(
      parent.toRealPath().resolve(lockFile.getFileName).toString,
      _ => new Guard)
    if (g.holder eq Thread.currentThread()) f // reentrant
    else g.synchronized {
      val ch = java.nio.channels.FileChannel.open(lockFile,
        StandardOpenOption.CREATE, StandardOpenOption.WRITE)
      try {
        val fl = ch.lock() // blocks on a concurrent PROCESS's hold
        g.holder = Thread.currentThread()
        try f finally { g.holder = null; fl.release() }
      } finally ch.close()
    }
  }
}

/** Mutual exclusion between an at-ingest work dir's two writers: the
  * ingest scaffold ([[graft.ops.IncrementalDedup.ingestLoop]] — slice
  * writes, the leftover sweep, and every foreachBatch trigger) and the
  * erasure cascade ([[Privacy.forgetDedupIndex]] — target discovery,
  * index COW rewrites, and the IN-PLACE arrivals rewrite).
  *
  * Why a lock and not ordering: the arrivals rewrite swaps a slice's
  * bytes under its original path, which is atomic per rename — but a
  * trigger that OPENED the file before the rename reads pre-erasure
  * bytes and may commit the subject's index rows AFTER the cascade's
  * final scrub, a silent-retention window no rewrite ordering closes.
  * Holding the lock for the duration of each trigger and of the whole
  * cascade means an erasure only ever runs BETWEEN triggers: slices
  * already consumed are scrubbed from the index, slices not yet
  * consumed are rewritten before any reader opens them.
  *
  * The lock FILE persists in the work dir — the underscore name keeps
  * it invisible to the `arrivals/<asterisk>/<asterisk>` glob and to
  * parquet readers.
  *
  * At 100 TB the coarseness is right: erasure is a rare admin
  * operation and waits at most one trigger; triggers pay one
  * uncontended lock per micro-batch, which is noise next to any
  * commit.
  */
private[graft] object WorkDirLock {
  def withLock[T](workDir: Path)(f: => T): T =
    FsLock.withFileLock(workDir.resolve("_maintenance.lock"))(f)
}
