package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Column names for row positions exposed on merge-on-read scans.
  * Every data-file relation can surface the file-source `_metadata`
  * struct; these two derived columns — qualified file path + row index
  * within the file — are the coordinates Iceberg v2 positional delete
  * files use to identify a row without rewriting its file.
  */
private[lake] object LakePos {
  val FileCol = "_gr_file"
  val PosCol = "_gr_pos"
}

/** Positional delete files (Iceberg v2 merge-on-read semantics).
  *
  * A delete dir holds parquet rows of `(_file, _pos)`: the ROOT-RELATIVE
  * data file path and the row's position in that file. Relative paths
  * keep the table relocatable (same contract as manifest `dirs`).
  * Scans anti-join the union of a snapshot's delete dirs against the
  * data relation's `_metadata`-derived coordinates; a delete set is
  * typically tiny next to the data, so AQE broadcasts the build side
  * and the read cost is one extra hashed-relation probe per row —
  * the price merge-on-read pays until the next compaction folds the
  * deletes into rewritten files.
  */
private[lake] object DeleteFiles {
  val FileField = "_file"
  val PosField = "_pos"

  val schema: StructType = StructType(Seq(
    StructField(FileField, StringType, nullable = false),
    StructField(PosField, LongType, nullable = false)))

  /** Project a frame carrying [[LakePos]] columns down to the delete
    * file schema, relativizing the absolute file path against the
    * table's qualified root prefix.
    */
  def toDeleteRows(df: DataFrame, rootPrefix: String): DataFrame =
    df.select(
      substring(col(LakePos.FileCol), rootPrefix.length + 1, Int.MaxValue).as(FileField),
      col(LakePos.PosCol).as(PosField))

  /** Anti-join `data` (which carries [[LakePos]] columns) against the
    * snapshot's delete dirs. Absolute-vs-relative reconciliation
    * happens on the (small) delete side, so the data side stays a
    * plain column reference the join can hash directly.
    */
  def applyTo(data: DataFrame, table: LakeTable, deleteDirs: Seq[String]): DataFrame = {
    if (deleteDirs.isEmpty) return data
    val paths = deleteDirs.map(table.location)
    val del = table.spark.read.schema(schema).parquet(paths: _*)
      .select(
        concat(lit(table.qualifiedRootPrefix), col(FileField)).as("_gr_del_file"),
        col(PosField).as("_gr_del_pos"))
    data.join(del,
      data(LakePos.FileCol) === del("_gr_del_file") &&
        data(LakePos.PosCol) === del("_gr_del_pos"),
      "left_anti")
  }
}
