package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level DML over lake tables — the MERGE INTO / UPDATE / DELETE
  * surface the reference enables through
  * `IcebergSparkSessionExtensions` but never exercises
  * (/root/reference/dags/utils/constants/constant.py:48; SURVEY.md §4).
  *
  * Implemented as declarative read-transform-overwrite snapshots: each
  * statement is a single Spark plan (filter / conditional projection /
  * outer join) followed by one atomic snapshot commit, so Catalyst
  * plans the heavy lifting and the commit inherits the lake layer's
  * snapshot isolation. Copy-on-write semantics — the same strategy
  * Iceberg's Spark writer defaults to.
  */
object LakeDml {

  /** DELETE FROM t WHERE cond. Rows where `cond` is TRUE are removed;
    * FALSE and NULL rows are kept (SQL DELETE semantics).
    */
  def delete(table: LakeTable, cond: Column): Snapshot = {
    val base = table.latest
    val df = table.read(base.map(_.version))
    val kept = df.where(!coalesce(cond, lit(false)))
    table.write(kept, WriteMode.Overwrite,
      base.map(_.partitionBy).getOrElse(Nil),
      expectedBase = base.map(_.version)) // fail instead of losing a concurrent commit
  }

  /** UPDATE t SET col = expr, ... WHERE cond. All SET expressions and
    * the condition evaluate against the PRE-update row (one projection,
    * SQL UPDATE semantics) — a sequential foldLeft of withColumns would
    * feed already-updated columns into later SETs and the condition.
    */
  def update(table: LakeTable, cond: Column, set: Map[String, Column]): Snapshot = {
    val base = table.latest
    val df = table.read(base.map(_.version))
    require(set.keySet.subsetOf(df.columns.toSet), s"unknown SET columns: ${set.keySet -- df.columns}")
    val hit = coalesce(cond, lit(false))
    val out = df.columns.toSeq.map { c =>
      set.get(c) match {
        case Some(e) => when(hit, e).otherwise(col(c)).as(c)
        case None    => col(c)
      }
    }
    table.write(df.select(out: _*), WriteMode.Overwrite,
      base.map(_.partitionBy).getOrElse(Nil),
      expectedBase = base.map(_.version))
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
            insertNotMatched: Boolean = true): Snapshot = {
    val base = table.latest
    val target = table.read(base.map(_.version))
    val cols = target.columns.toSeq
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
    val out = cols.map { c =>
      val fromSrc =
        if (set.nonEmpty) set.getOrElse(c, tgt(c))
        else srcOr(c, sys.error(s"MERGE source lacks column '$c'; supply `set` or a full-width source"))
      val insert = if (insertNotMatched) srcOr(c, lit(null)) else lit(null)
      when(matched, fromSrc)
        .when(srcOnly, insert)
        .otherwise(tgt(c)).as(c)
    }
    val merged = (if (insertNotMatched) joined else joined.where(!srcOnly))
      .select(out: _*)
    table.write(merged, WriteMode.Overwrite,
      base.map(_.partitionBy).getOrElse(Nil),
      expectedBase = base.map(_.version))
  }
}
