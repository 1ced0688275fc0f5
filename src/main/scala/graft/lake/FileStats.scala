package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Per-file column statistics carried in the snapshot manifest — the
  * role Iceberg's manifest min/max stats play: planning skips files
  * whose [min, max] cannot satisfy a predicate WITHOUT listing row
  * groups or reading parquet footers. At 100 TB the difference is
  * "open every footer of every live file" vs "drop most files from
  * the scan while still on the driver".
  *
  * Stats are gathered where they are cheap and tight: compaction
  * ([[LakeTable.compact]] / [[LakeTable.compactZOrder]]) collects
  * min/max of the sort / z-order columns over the files it just wrote
  * (one columnar aggregate over the new dir), which is exactly when
  * file ranges become disjoint and skipping starts paying.
  * [[LakeTable.write]] accepts `statsBy` for direct writes.
  *
  * Values are encoded in an ordered string domain per column type
  * (numbers/timestamps/dates as decimal strings, strings raw), so the
  * driver compares probe values without re-deriving Spark types.
  * Pruning is conservative: a file with missing/null stats, or a
  * probe whose domain mismatches, is always kept.
  */
private[graft] object FileStats {
  /** Legacy single-blob key: stats for a snapshot whose ONLY dir is
    * the one the blob describes. Still read (old manifests), no longer
    * written.
    */
  val MetaKey = "graft.stats"
  /** Per-dir stats keys (`graft.stats:data/<uuid>`): each commit dir
    * carries its own blob, so appends carry prior dirs' stats forward
    * untouched and file skipping survives append-heavy tables — no
    * compaction required to re-arm it.
    */
  val DirKeyPrefix = "graft.stats:"
  def dirKey(dirName: String): String = DirKeyPrefix + dirName
  /** The table's stats-column set (comma-joined), persisted in the
    * snapshot meta: set by `statsBy` writes and sorted/z-ordered
    * compactions, inherited by appends so every new dir auto-collects
    * min/max on the same columns.
    */
  val StatsColsKey = "graft.statsCols"
  /** Per-dir data size (`graft.bytes:data/<uuid>` → total file bytes),
    * recorded by the commit that wrote the dir and carried with it.
    * Powers byte-based streaming admission control
    * (`maxBytesPerTrigger`) without any scan-time filesystem listing.
    */
  val BytesKeyPrefix = "graft.bytes:"
  def bytesKey(dirName: String): String = BytesKeyPrefix + dirName
  def joinCols(cols: Seq[String]): String = cols.mkString(",")
  def splitCols(s: String): Seq[String] =
    s.split(',').toSeq.map(_.trim).filter(_.nonEmpty)

  /** Ordered comparison key: Left = numeric domain, Right = string.
    * NaN/Infinity have no BigDecimal form → None, which both encodes
    * as "no stat" and compares as "unknown" — a NaN max (Spark sorts
    * NaN largest) degrades that file to unprunable instead of crashing
    * the write.
    */
  private def toKey(v: Any): Option[Either[BigDecimal, String]] = v match {
    case null                  => None
    case d: java.lang.Double if d.isNaN || d.isInfinite => None
    case f: java.lang.Float  if f.isNaN || f.isInfinite => None
    case t: java.sql.Timestamp =>
      Some(Left(BigDecimal(t.getTime) * 1000 + BigDecimal((t.getNanos % 1000000) / 1000)))
    case d: java.sql.Date      => Some(Left(BigDecimal(d.toLocalDate.toEpochDay)))
    case b: java.lang.Boolean  => Some(Left(if (b) BigDecimal(1) else BigDecimal(0)))
    case n: java.lang.Number   => Some(Left(BigDecimal(n.toString)))
    case s: String             => Some(Right(s))
    case other                 => Some(Right(other.toString))
  }

  private def encode(v: Any): String = toKey(v) match {
    case Some(Left(n))  => "n:" + n.toString
    case Some(Right(s)) => "s:" + s
    case None           => null
  }

  private def decode(s: String): Option[Either[BigDecimal, String]] =
    if (s == null) None
    else if (s.startsWith("n:")) Some(Left(BigDecimal(s.substring(2))))
    else Some(Right(s.substring(2)))

  /** Spark computed the min/max in UTF-8 BINARY order; Java's String
    * compareTo is UTF-16 code-unit order and the two disagree above
    * the BMP (a supplementary-plane char is 4-byte UTF-8, sorting
    * after every BMP char, but its UTF-16 surrogates start at 0xD800,
    * sorting BEFORE U+E000..U+FFFF). Compare the same way the stats
    * were made, or a file whose max is a supplementary-plane string
    * gets wrongly pruned for high-BMP probes.
    */
  private def utf8Leq(x: String, y: String): Boolean = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    a.length <= b.length
  }

  private def leq(a: Either[BigDecimal, String], b: Either[BigDecimal, String]): Option[Boolean] =
    (a, b) match {
      case (Left(x), Left(y))   => Some(x <= y)
      case (Right(x), Right(y)) => Some(utf8Leq(x, y))
      case _                    => None // mixed domains: unknown → keep
    }

  /** One distributed aggregate over the just-written dir → JSON stats
    * blob for the manifest meta. Row count = file count of ONE commit
    * dir (index state bounded by `targetPartitions`, not data size).
    */
  /** File key = path RELATIVE to the commit dir (plain file name for
    * flat dirs, `_p_…=…/part-….parquet` under partition specs), cut
    * at the unique `<uuid>/` commit-dir segment so URI scheme
    * differences can't shift it.
    */
  def relativeKey(pathOrUri: String, commitDirName: String): String = {
    val marker = "/" + commitDirName + "/"
    val i = pathOrUri.indexOf(marker)
    if (i < 0) pathOrUri.substring(pathOrUri.lastIndexOf('/') + 1)
    else pathOrUri.substring(i + marker.length)
  }

  def collect(spark: SparkSession, dir: org.apache.hadoop.fs.Path,
              cols: Seq[String]): String = {
    val df = spark.read.parquet(dir.toString)
    val present = cols.filter(df.columns.contains)
    require(present.nonEmpty, s"no stats columns $cols in ${df.columns.toSeq}")
    val aggs = present.flatMap(c => Seq(min(col(c)), max(col(c))))
    val rows = df.groupBy(input_file_name().as("_f"))
      .agg(aggs.head, aggs.tail: _*).collect()
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val rootNode = om.createObjectNode()
    val colsNode = rootNode.putArray("cols")
    present.foreach(colsNode.add)
    val filesNode = rootNode.putObject("files")
    rows.foreach { r =>
      val fNode = filesNode.putArray(relativeKey(r.getString(0), dir.getName))
      present.indices.foreach { i =>
        val pair = fNode.addArray()
        pair.add(encode(r.get(1 + 2 * i)))
        pair.add(encode(r.get(2 + 2 * i)))
      }
    }
    om.writeValueAsString(rootNode)
  }

  /** File names (relative to the commit dir) that can satisfy ALL
    * predicates, or None when the stats cover no predicate column
    * (no pruning possible).
    */
  def surviving(statsJson: String, preds: Seq[LakePredicate],
                schema: StructType): Option[Set[String]] = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.readTree(statsJson)
    val cols = {
      val a = node.get("cols")
      (0 until a.size()).map(a.get(_).asText())
    }
    val applicable = preds.filter(p => cols.contains(p.col))
    if (applicable.isEmpty) return None
    val files = node.get("files")
    val kept = Set.newBuilder[String]
    val it = files.fields()
    while (it.hasNext) {
      val e = it.next()
      val ranges = e.getValue
      def range(c: String): (Option[Either[BigDecimal, String]], Option[Either[BigDecimal, String]]) = {
        val i = cols.indexOf(c)
        val pair = ranges.get(i)
        def at(j: Int): Option[Either[BigDecimal, String]] =
          if (pair.get(j).isNull) None else decode(pair.get(j).asText())
        (at(0), at(1))
      }
      val keep = applicable.forall { p =>
        val (lo, hi) = range(p.col)
        // can a point probe `v` fall inside this file's [lo, hi]?
        // (null probe / missing stats / cross-domain compare → keep;
        // only provable emptiness prunes)
        def pointIn(pv: Any): Boolean = (toKey(pv), lo, hi) match {
          case (None, _, _) => true
          case (Some(v), Some(l), Some(h)) => (leq(l, v), leq(v, h)) match {
            case (Some(a), Some(b)) => a && b
            case _                  => true
          }
          case _ => true
        }
        p match {
          case LakePredicate.EqualTo(_, v) => pointIn(v)
          // IN = disjunction of point probes: keep if ANY could match
          case LakePredicate.In(_, vs)     => vs.exists(pointIn)
          case LakePredicate.GtEq(_, v) => (toKey(v), hi) match {
            case (Some(k), Some(h)) => leq(k, h).getOrElse(true)
            case _                  => true
          }
          case LakePredicate.LtEq(_, v) => (toKey(v), lo) match {
            case (Some(k), Some(l)) => leq(l, k).getOrElse(true)
            case _                  => true
          }
        }
      }
      if (keep) kept += e.getKey
    }
    Some(kept.result())
  }
}
