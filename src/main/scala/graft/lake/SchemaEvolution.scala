package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._

/** Iceberg-style field identity, lite: every column carries a stable
  * numeric id in its `StructField` metadata (`graft.id`), assigned at
  * first write and preserved across appends. Rename / drop / widen are
  * then METADATA-ONLY commits — the data dirs (and their recorded
  * physical schemas) never move; reads align each dir's physical
  * columns to the current schema BY ID, falling back to by-name for
  * pre-id files, exactly the resolution order Iceberg's spec defines
  * (ids first, name mapping for legacy files).
  */
private[lake] object SchemaIds {
  val Key = "graft.id"
  /** Snapshot-meta high-water mark of assigned field ids. Without it,
    * dropping the max-id column and appending a new one would REUSE
    * the dropped id and [[align]] would resurrect the dropped column's
    * bytes under the new name — Iceberg keeps `last-column-id` in
    * table metadata for exactly this reason.
    */
  val LastIdKey = "graft.lastFieldId"

  def idOf(f: StructField): Option[Long] =
    if (f.metadata.contains(Key)) Some(f.metadata.getLong(Key)) else None

  def maxId(schema: StructType): Long =
    schema.fields.flatMap(idOf).foldLeft(0L)(math.max)

  private def withId(f: StructField, id: Long): StructField =
    f.copy(metadata = new MetadataBuilder()
      .withMetadata(f.metadata).putLong(Key, id).build())

  /** Annotate `schema` with field ids: same-name fields inherit the
    * base's id, new fields get fresh ids above both the base's max and
    * the table's historical high-water mark (`idFloor`).
    */
  def annotate(schema: StructType, base: Option[StructType], idFloor: Long = 0L): StructType = {
    val baseIds: Map[String, Long] = base
      .map(_.fields.flatMap(f => idOf(f).map(f.name -> _)).toMap)
      .getOrElse(Map.empty)
    var next = (Seq(idFloor) ++ baseIds.values ++ schema.fields.flatMap(idOf))
      .foldLeft(0L)(math.max) + 1
    StructType(schema.fields.map { f =>
      idOf(f) match {
        case Some(_) => f
        case None => baseIds.get(f.name) match {
          case Some(id) => withId(f, id)
          case None     => val id = next; next += 1; withId(f, id)
        }
      }
    })
  }

  /** Append-time schema union: the base's fields (stable order + ids)
    * followed by fields only the incoming frame has (fresh ids). An
    * append can never silently narrow the table, and a same-name type
    * conflict either auto-WIDENS the snapshot type (loss-free up-cast,
    * e.g. int→long) or fails loudly — never a silent lossy cast on
    * read.
    */
  def merge(base: StructType, incoming: StructType, idFloor: Long = 0L): StructType = {
    import org.apache.spark.sql.catalyst.expressions.Cast
    // canUpCast alone would bless anything→string ("loss-free" but
    // type-destroying); widening stays within the type family
    def widens(from: org.apache.spark.sql.types.DataType,
               to: org.apache.spark.sql.types.DataType): Boolean =
      Cast.canUpCast(from, to) &&
        !(to == org.apache.spark.sql.types.StringType &&
          from != org.apache.spark.sql.types.StringType)
    val incomingByName = incoming.fields.map(f => f.name -> f).toMap
    val merged = base.fields.map { bf =>
      incomingByName.get(bf.name) match {
        case Some(inf) if inf.dataType == bf.dataType => bf
        case Some(inf) if widens(inf.dataType, bf.dataType) => bf // narrow data widens on read
        case Some(inf) if widens(bf.dataType, inf.dataType) =>
          bf.copy(dataType = inf.dataType) // append auto-widens the table
        case Some(inf) => throw new IllegalArgumentException(
          s"append column '${bf.name}': ${inf.dataType} is incompatible with table type ${bf.dataType}")
        case None => bf
      }
    }
    val incomingAnnotated = annotate(incoming, Some(base), idFloor)
    val baseNames = base.fieldNames.toSet
    StructType(merged ++ incomingAnnotated.fields.filterNot(f => baseNames.contains(f.name)))
  }

  /** Project a frame read under `phys` (a dir's write-time schema)
    * onto `cur` (the snapshot's current schema): match by id, fall
    * back to name, null-fill added columns, cast widened ones. The
    * identity case short-circuits so non-evolved tables pay nothing.
    * `extra` columns (e.g. merge-on-read position columns) pass
    * through untouched at the end.
    */
  def align(df: DataFrame, phys: StructType, cur: StructType,
            extra: Seq[String] = Nil): DataFrame = {
    if (phys.json == cur.json && extra.isEmpty) return df
    val physById: Map[Long, StructField] =
      phys.fields.flatMap(f => idOf(f).map(_ -> f)).toMap
    val physHasIds = physById.nonEmpty
    val out = cur.fields.map { cf =>
      // ids are authoritative when both sides carry them — a by-name
      // fallback there would wrongly resolve a NEW field to an old
      // same-named column (e.g. re-adding a name after a rename)
      val matched =
        if (physHasIds && idOf(cf).isDefined) idOf(cf).flatMap(physById.get)
        else phys.fields.find(_.name == cf.name)
      matched match {
        case Some(pf) => col(pf.name).cast(cf.dataType).as(cf.name)
        case None     => lit(null).cast(cf.dataType).as(cf.name)
      }
    } ++ extra.map(col)
    df.select(scala.collection.immutable.ArraySeq.unsafeWrapArray(out): _*)
  }
}
