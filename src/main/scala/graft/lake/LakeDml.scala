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
    val df = table.read(None)
    val kept = df.where(!coalesce(cond, lit(false)))
    table.write(kept, WriteMode.Overwrite,
      table.latest.map(_.partitionBy).getOrElse(Nil))
  }

  /** UPDATE t SET col = expr, ... WHERE cond. */
  def update(table: LakeTable, cond: Column, set: Map[String, Column]): Snapshot = {
    val df = table.read(None)
    val hit = coalesce(cond, lit(false))
    val updated = set.foldLeft(df) { case (acc, (name, expr)) =>
      acc.withColumn(name, when(hit, expr).otherwise(col(name)))
    }
    table.write(updated, WriteMode.Overwrite,
      table.latest.map(_.partitionBy).getOrElse(Nil))
  }

  /** MERGE INTO target USING source ON key equality:
    * WHEN MATCHED THEN UPDATE SET ... / WHEN NOT MATCHED THEN INSERT *.
    *
    * `set` maps target column name → expression over the joined row
    * (reference source columns with `sourcePrefixed`); when empty,
    * matched rows take all source columns (classic upsert). Source must
    * be key-unique (enforced — a multi-match MERGE is ambiguous and
    * errors in Iceberg/ANSI too).
    */
  def merge(table: LakeTable, source: DataFrame, keys: Seq[String],
            set: Map[String, Column] = Map.empty,
            insertNotMatched: Boolean = true): Snapshot = {
    val target = table.read(None)
    val cols = target.columns.toSeq
    require(keys.nonEmpty && keys.forall(cols.contains), s"bad merge keys: $keys")

    val srcDup = source.groupBy(keys.map(col): _*).count().filter(col("count") > 1).limit(1).count()
    require(srcDup == 0, "MERGE source has duplicate keys — ambiguous match")

    val src = source.select(source.columns.map(c => col(c).as(s"_src_$c")).toSeq: _*)
    val joinCond = keys.map(k => target(k) <=> src(s"_src_$k")).reduce(_ && _)
    val joined = target.join(src, joinCond, "full_outer")
    val matched = keys.map(k => src(s"_src_$k").isNotNull).reduce(_ && _) &&
      keys.map(k => target(k).isNotNull).reduce(_ && _)
    val srcOnly = keys.map(k => target(k).isNull).reduce(_ && _)

    val out = cols.map { c =>
      val fromSrc = if (set.nonEmpty) set.getOrElse(c, target(c)) else src(s"_src_$c")
      val insert = src(s"_src_$c")
      when(matched, fromSrc)
        .when(srcOnly, if (insertNotMatched) insert else lit(null))
        .otherwise(target(c)).as(c)
    }
    val merged0 = joined.select(out: _*)
    val merged = if (insertNotMatched) merged0
                 else joined.where(!srcOnly).select(out: _*)
    table.write(merged, WriteMode.Overwrite,
      table.latest.map(_.partitionBy).getOrElse(Nil))
  }
}
