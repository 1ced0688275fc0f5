package graft.state

import java.nio.file.{Files, Path, StandardCopyOption}
import java.sql.Timestamp
import scala.jdk.CollectionConverters._

/** Persisted high-watermark per (pipeline, stage) — the engine-owned
  * replacement for the reference's Airflow-metadata lookup
  * (`get_last_success_time`, /root/reference/dags/utils/constants/constant.py:66-85).
  *
  * The reference stores its watermark implicitly as "timestamp of the
  * last successful Airflow task" and compares formatted *strings* in a
  * fixed timezone (constant.py:83-85) — fragile across zones. Here the
  * watermark is an instant (epoch micros), compared as an instant
  * (SURVEY.md §7.4 item 3). One tiny JSON file per key, updated via
  * temp-file + atomic rename, so concurrent readers never see a torn
  * value. Missing key falls back to the epoch, like constant.py:85.
  */
object WatermarkStore {
  /** Timestamp <-> epoch-micros (getTime alone floors to millis, which
    * would re-extract boundary rows with sub-ms timestamps). floorDiv/
    * floorMod, not `/`/`%`: truncation toward zero rounds pre-epoch
    * (negative-millis) instants in the wrong direction.
    */
  def toMicros(ts: Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
  def fromMicros(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

}

final class WatermarkStore(dir: Path) {
  Files.createDirectories(dir)

  private def fileFor(pipeline: String, stage: String): Path = {
    require(!pipeline.contains('/') && !stage.contains('/'), "bad watermark key")
    dir.resolve(s"$pipeline.$stage.watermark")
  }

  /** Last recorded watermark (epoch micros on disk), or the epoch. */
  def get(pipeline: String, stage: String): Timestamp = {
    val p = fileFor(pipeline, stage)
    if (Files.exists(p)) WatermarkStore.fromMicros(Files.readString(p).trim.toLong)
    else new Timestamp(0L)
  }

  /** Record a new watermark; monotonic (a stale writer can't move it
    * back). The read-compare-write runs under an OS file lock so a
    * concurrent stale writer can't interleave between the check and
    * the write and regress the value.
    */
  def advance(pipeline: String, stage: String, to: Timestamp): Timestamp =
    // shared two-layer lock (JVM monitor + OS file lock, canonical-
    // path-keyed): graft.lake.FsLock — one copy of the subtle idiom
    graft.lake.FsLock.withFileLock(dir.resolve(s"$pipeline.$stage.lock")) {
      val cur = get(pipeline, stage)
      if (to.after(cur)) {
        val p = fileFor(pipeline, stage)
        val tmp = Files.createTempFile(dir, ".wm", ".tmp")
        Files.writeString(tmp, WatermarkStore.toMicros(to).toString)
        Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
        to
      } else cur
    }

  def all(): Map[String, Timestamp] = {
    val stream = Files.list(dir)
    try
      stream.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".watermark"))
        .map(p => p.getFileName.toString.stripSuffix(".watermark") ->
          WatermarkStore.fromMicros(Files.readString(p).trim.toLong))
        .toMap
    finally stream.close()
  }
}
