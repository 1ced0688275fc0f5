package graft.lake.sqlcat

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.lake.{LakeTable, Snapshot}

/** SQL-callable maintenance procedures (Spark 4 DSv2 `ProcedureCatalog`)
  * — the `CALL` surface Iceberg ships as `system.*` procedures and the
  * reference enables through its extensions
  * (/root/reference/dags/utils/constants/constant.py:43-50):
  *
  * {{{
  *   CALL graft.system.compact(table => 'ns.t', target_partitions => 4, sort_by => 'id')
  *   CALL graft.system.expire_snapshots(table => 'ns.t', retain_last => 1)
  *   CALL graft.system.remove_orphan_files(table => 'ns.t', grace_ms => 0)
  *   CALL graft.system.set_partition_spec(table => 'ns.t', spec => 'days(ts)')
  *   CALL graft.system.rollback_to_version(table => 'ns.t', version => 3)
  *   CALL graft.system.rewrite_position_deletes(table => 'ns.t')
  * }}}
  *
  * Each wraps the already-tested [[LakeTable]] maintenance API and
  * returns a one-row result (versions/counts) through a [[LocalScan]].
  * At cluster scale these are the operations a scheduler fires against
  * a 100 TB table from plain SQL — no JVM client code needed.
  */
private[sqlcat] object GraftProcedures {

  /** One procedure: parameter list (slot 0 is always the table
    * identifier), result schema, and the action over the resolved
    * table + bound argument row.
    */
  private final class Proc(
      procName: String,
      params: Array[ProcedureParameter],
      out: StructType,
      resolve: String => LakeTable,
      run: (LakeTable, InternalRow) => Seq[Any])
    extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = s"graft lake maintenance: $procName"
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params
    override def isDeterministic: Boolean = false // mutates table state
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val table = resolve(input.getUTF8String(0).toString)
      val result = run(table, input)
      val row: InternalRow = new GenericInternalRow(result.map {
        case s: String => UTF8String.fromString(s)
        case other     => other.asInstanceOf[AnyRef]
      }.toArray[Any])
      val scan: Scan = new LocalScan {
        override def readSchema(): StructType = out
        override def rows(): Array[InternalRow] = Array(row)
      }
      util.List.of(scan).iterator()
    }
  }

  /** Catalog-scoped procedure: no table slot, any number of result
    * rows (one per affected table — the shape of catalog-wide
    * operations like erasure discovery).
    */
  private final class CatalogProc(
      procName: String,
      params: Array[ProcedureParameter],
      out: StructType,
      run: InternalRow => Seq[Seq[Any]])
    extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = s"graft catalog-wide: $procName"
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val result = run(input).map(vals =>
        new GenericInternalRow(vals.map {
          case s: String => UTF8String.fromString(s)
          case other     => other.asInstanceOf[AnyRef]
        }.toArray[Any]): InternalRow)
      val scan: Scan = new LocalScan {
        override def readSchema(): StructType = out
        override def rows(): Array[InternalRow] = result.toArray
      }
      util.List.of(scan).iterator()
    }
  }

  private def p(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()
  private def pDefault(name: String, dt: DataType, default: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  /** Split a user-supplied column list (',') or spec list (';' — spec
    * strings themselves contain commas, `bucket(4, c)`).
    */
  private def cols(s: String): Seq[String] =
    s.split(',').toSeq.map(_.trim).filter(_.nonEmpty)

  def load(name: String, resolve: String => LakeTable,
           catalog: () => graft.lake.LakeCatalog): Option[UnboundProcedure] =
    name.toLowerCase match {
      // refresh an incrementally-maintained materialized view whose
      // definition was persisted by IncrementalView.refreshSql — the
      // scheduler-facing face of the O(changes) gold refresh:
      //   CALL graft.system.refresh_view(view => 'gold.by_cust')
      case "refresh_view" => Some(new Proc("refresh_view",
        Array(p("view", StringType)),
        StructType(Seq(StructField("view_version", LongType),
          StructField("source_version", LongType),
          StructField("mode", StringType))),
        resolve,
        (_, in) => {
          val view = in.getUTF8String(0).toString
          // dispatch on the persisted definition kind: aggregate view
          // (IncrementalView) vs keyed join view (JoinView)
          val t = catalog().table(view)
          // newest definition key wins, via the lazy newest-first meta
          // walk — every refresh re-records its definition, so this is
          // typically ONE manifest read, not an O(history) parse
          val isJoin = t.latestMetaOf(Seq(
            graft.lake.JoinView.DefinitionKey,
            graft.lake.IncrementalView.DefinitionKey))
            .exists(_._1 == graft.lake.JoinView.DefinitionKey)
          val snap =
            if (isJoin) graft.lake.JoinView.refreshByName(catalog(), view)
            else graft.lake.IncrementalView.refreshByName(catalog(), view)
          // an up-to-date view returns its CURRENT snapshot, which may
          // be a maintenance commit carrying neither meta key
          val srcV = snap.meta.get(graft.lake.IncrementalView.SourceVersionKey)
            .orElse(snap.meta.get(graft.lake.JoinView.FactVersionKey))
            .map(_.toLong).getOrElse(-1L)
          Seq(snap.version, srcV,
            snap.meta.getOrElse(graft.lake.IncrementalView.RefreshModeKey, "noop"))
        }))
      case "compact" => Some(new Proc("compact",
        Array(p("table", StringType), p("target_partitions", IntegerType),
          pDefault("sort_by", StringType, "''"), pDefault("zorder_by", StringType, "''"),
          pDefault("small_dir_bytes", LongType, "-1"),
          pDefault("where", StringType, "''")),
        StructType(Seq(StructField("version", LongType), StructField("op", StringType))),
        resolve,
        (t, in) => {
          val tp = in.getInt(1)
          val sortBy = cols(in.getUTF8String(2).toString)
          val zorderBy = cols(in.getUTF8String(3).toString)
          val smallBytes = in.getLong(4)
          val where = in.getUTF8String(5).toString
          require(sortBy.isEmpty || zorderBy.isEmpty,
            "compact takes sort_by OR zorder_by, not both")
          require(smallBytes < 0 || (sortBy.isEmpty && zorderBy.isEmpty),
            "binpack (small_dir_bytes) does not combine with sort_by/zorder_by")
          require(where.isEmpty || (sortBy.isEmpty && zorderBy.isEmpty && smallBytes < 0),
            "where-scoped compaction keeps the table's declared clustering and does " +
              "not combine with sort_by/zorder_by/small_dir_bytes")
          val snap =
            if (where.nonEmpty) {
              // scoping only: an unextractable conjunct widens the
              // rewrite, never loses rows
              val preds = graft.lake.PredicateExtract.fromCondition(
                t.read(), org.apache.spark.sql.functions.expr(where))
              require(preds.nonEmpty,
                s"could not derive a scoping predicate from: $where")
              t.compactWhere(preds, tp)
            }
            else if (smallBytes >= 0) t.compactBinPack(smallBytes, tp)
            else if (zorderBy.nonEmpty) t.compactZOrder(tp, zorderBy)
            else t.compact(tp, sortBy)
          Seq(snap.version, snap.op)
        }))

      case "expire_snapshots" => Some(new Proc("expire_snapshots",
        Array(p("table", StringType), pDefault("retain_last", IntegerType, "-1"),
          pDefault("older_than_ms", LongType, "-1")),
        StructType(Seq(StructField("expired_manifests", IntegerType),
          StructField("deleted_dirs", IntegerType))),
        resolve,
        (t, in) => {
          val retain = in.getInt(1)
          val olderThan = in.getLong(2)
          require((retain > 0) ^ (olderThan >= 0),
            "expire_snapshots takes exactly one of retain_last / older_than_ms")
          val (m, d) =
            if (retain > 0) t.expireSnapshots(retain)
            else t.expireSnapshotsOlderThan(olderThan)
          Seq(m, d)
        }))

      // right-to-be-forgotten erasure (graft.lake.Privacy) from plain
      // SQL — the form deletion requests actually reach a warehouse:
      //   CALL graft.system.forget(table => 'ns.t', key_col => 'uid',
      //                            keys => '17,42,99')
      // COW delete + full history expiry + orphan sweep + storage-level
      // residual audit; fails loud on retention anchors (tags/branches)
      case "forget" => Some(new Proc("forget",
        Array(p("table", StringType), p("key_col", StringType), p("keys", StringType)),
        StructType(Seq(StructField("rows_deleted", LongType),
          StructField("version", LongType),
          StructField("expired_snapshots", IntegerType),
          StructField("purged_dirs", IntegerType),
          StructField("residual_rows", LongType))),
        resolve,
        (t, in) => {
          val ident = in.getUTF8String(0).toString
          val keyCol = in.getUTF8String(1).toString
          val raw = in.getUTF8String(2).toString
            .split(',').map(_.trim).filter(_.nonEmpty)
          require(raw.nonEmpty, "empty erasure request")
          // keys parse to the key COLUMN's declared type (ADVICE r9:
          // guessing "all digits → Long" against a STRING column made
          // Spark cast the column to bigint, so uid '042' matched a
          // request for '42' — over-deleting a different subject).
          // Commas inside string keys are unrepresentable on the SQL
          // surface; use the Scala Privacy.forget API for those.
          val kt = t.latest.map(_.schema).getOrElse(t.read().schema)
            .find(_.name == keyCol).getOrElse(
              throw new IllegalArgumentException(
                s"key column '$keyCol' not in $ident's schema")).dataType
          import org.apache.spark.sql.types._
          val keys: Seq[Any] = kt match {
            case LongType    => raw.map(_.toLong: Any).toSeq
            case IntegerType => raw.map(_.toInt: Any).toSeq
            case ShortType   => raw.map(_.toShort: Any).toSeq
            case StringType  => raw.map(identity[Any]).toSeq
            case other => throw new IllegalArgumentException(
              s"forget supports integral/string key columns; '$keyCol' is $other")
          }
          val r = graft.lake.Privacy
            .forget(catalog(), Seq(ident -> keyCol), keys).head
          Seq[Any](r.rowsDeleted, r.version, r.expiredSnapshots,
            r.purgedDirs, r.residualRows)
        }))

      // catalog-wide erasure with derived-table discovery
      // (graft.lake.Privacy.forgetCatalog): one row of evidence per
      // table whose schema carries the key column —
      //   CALL graft.system.forget_catalog(key_col => 'uid',
      //                                    keys => '17,42', exclude => 'ns.t2')
      // Key typing follows the discovered key columns — the engine
      // validates the set is type-UNIFORM (integral widths may mix;
      // string/numeric mixes fail loud before any delete), so parsing
      // from the first discovered column is safe. Integral keys parse
      // as Long: isin(Long) against narrower integral columns widens
      // the COLUMN losslessly, never lossily.
      case "forget_catalog" => Some(new CatalogProc("forget_catalog",
        Array(p("key_col", StringType), p("keys", StringType),
          pDefault("exclude", StringType, "''")),
        StructType(Seq(StructField("table", StringType),
          StructField("rows_deleted", LongType),
          StructField("version", LongType),
          StructField("expired_snapshots", IntegerType),
          StructField("purged_dirs", IntegerType),
          StructField("residual_rows", LongType))),
        in => {
          val keyCol = in.getUTF8String(0).toString
          val raw = in.getUTF8String(1).toString
            .split(',').map(_.trim).filter(_.nonEmpty)
          require(raw.nonEmpty, "empty erasure request")
          val exclude = cols(in.getUTF8String(2).toString)
          val cat = catalog()
          // ONE discovery walk serves both key typing and erasure (a
          // second walk per call would double the metadata reads on a
          // wide warehouse)
          val targets = graft.lake.Privacy.discoverKeyTargets(cat, keyCol, exclude)
          val kt = targets.head match { case (_, c, t) => t.latest.get.schema(c).dataType }
          import org.apache.spark.sql.types._
          val keys: Seq[Any] = kt match {
            case LongType | IntegerType | ShortType | ByteType =>
              raw.map(_.toLong: Any).toSeq
            case StringType => raw.map(identity[Any]).toSeq
            case other => throw new IllegalArgumentException(
              s"forget_catalog supports integral/string key columns; '$keyCol' is $other")
          }
          graft.lake.Privacy.forgetDiscovered(targets, keyCol, keys)
            .map(r => Seq[Any](r.ident, r.rowsDeleted, r.version,
              r.expiredSnapshots, r.purgedDirs, r.residualRows))
        }))

      case "remove_orphan_files" => Some(new Proc("remove_orphan_files",
        Array(p("table", StringType),
          pDefault("grace_ms", LongType, (60 * 60 * 1000L).toString)),
        StructType(Seq(StructField("removed_dirs", IntegerType))),
        resolve,
        (t, in) => Seq(t.removeOrphanFiles(in.getLong(1)))))

      case "set_partition_spec" => Some(new Proc("set_partition_spec",
        Array(p("table", StringType), p("spec", StringType)),
        StructType(Seq(StructField("version", LongType))),
        resolve,
        (t, in) => Seq(t.setPartitionSpec(
          Snapshot.splitSpec(in.getUTF8String(1).toString)).version)))

      case "rewrite_position_deletes" => Some(new Proc("rewrite_position_deletes",
        Array(p("table", StringType), pDefault("target_partitions", IntegerType, "1")),
        StructType(Seq(StructField("version", LongType),
          StructField("delete_dirs", IntegerType))),
        resolve,
        (t, in) => {
          val snap = t.rewritePositionDeletes(in.getInt(1))
          // Seq[Any] stops scala's numeric widening: a plain Seq(Long, Int)
          // infers Seq[Long] and the Int slot would carry a boxed Long
          Seq[Any](snap.version, snap.deleteDirs.size)
        }))

      case "rewrite_equality_deletes" => Some(new Proc("rewrite_equality_deletes",
        Array(p("table", StringType), pDefault("target_partitions", IntegerType, "1")),
        StructType(Seq(StructField("version", LongType),
          StructField("eq_delete_entries", IntegerType))),
        resolve,
        (t, in) => {
          val snap = t.rewriteEqualityDeletes(in.getInt(1))
          Seq[Any](snap.version, snap.eqDeletes.size)
        }))

      case "create_tag" => Some(new Proc("create_tag",
        Array(p("table", StringType), p("tag", StringType),
          pDefault("version", LongType, "-1")),
        StructType(Seq(StructField("version", LongType))),
        resolve,
        (t, in) => {
          val v = in.getLong(2)
          Seq(t.createTag(in.getUTF8String(1).toString,
            if (v >= 0) Some(v) else None))
        }))

      case "drop_tag" => Some(new Proc("drop_tag",
        Array(p("table", StringType), p("tag", StringType)),
        StructType(Seq(StructField("dropped", BooleanType))),
        resolve,
        (t, in) => Seq(t.dropTag(in.getUTF8String(1).toString))))

      // in-place import of existing parquet (Iceberg's add_files):
      //   CALL graft.system.add_files(table => 'ns.t', source => '/data/legacy')
      // metadata-only — no byte of the source is copied or rewritten
      case "add_files" => Some(new Proc("add_files",
        Array(p("table", StringType), p("source", StringType)),
        StructType(Seq(StructField("version", LongType),
          StructField("added_rows", LongType))),
        resolve,
        (t, in) => {
          val snap = t.addFiles(in.getUTF8String(1).toString)
          val dir = snap.dirs.last
          Seq(snap.version,
            snap.meta.get(graft.lake.FileStats.rowsKey(dir)).map(_.toLong).getOrElse(-1L))
        }))

      // CHECK constraints (Delta's ADD/DROP CONSTRAINT as procedures):
      //   CALL graft.system.add_check(table => 'ns.t', name => 'pos', predicate => 'v >= 0')
      case "add_check" => Some(new Proc("add_check",
        Array(p("table", StringType), p("name", StringType), p("predicate", StringType)),
        StructType(Seq(StructField("version", LongType))),
        resolve,
        (t, in) => Seq(t.addCheckConstraint(in.getUTF8String(1).toString,
          in.getUTF8String(2).toString).version)))

      // declared auto-compaction (Delta autoCompact shape; 0 clears):
      //   CALL graft.system.set_autocompact(table => 'ns.t', small_dirs => 8)
      case "set_autocompact" => Some(new Proc("set_autocompact",
        Array(p("table", StringType), p("small_dirs", IntegerType),
          pDefault("max_dir_bytes", LongType, (128L << 20).toString)),
        StructType(Seq(StructField("version", LongType))),
        resolve,
        (t, in) => Seq(t.setAutoCompact(in.getInt(1), in.getLong(2)).version)))

      case "drop_check" => Some(new Proc("drop_check",
        Array(p("table", StringType), p("name", StringType)),
        StructType(Seq(StructField("version", LongType))),
        resolve,
        (t, in) => Seq(t.dropCheckConstraint(in.getUTF8String(1).toString).version)))

      // zero-copy shallow clone ([[graft.lake.LakeTable.cloneTo]]):
      //   CALL graft.system.clone(table => 'ns.src', target => 'ns.fork')
      // one manifest write — no data moves at any table size
      case "clone" => Some(new Proc("clone",
        Array(p("table", StringType), p("target", StringType)),
        StructType(Seq(StructField("version", LongType),
          StructField("referenced_dirs", IntegerType))),
        resolve,
        (t, in) => {
          val snap = t.cloneTo(catalog().table(in.getUTF8String(1).toString))
          Seq[Any](snap.version, snap.dirs.size)
        }))

      case "rollback_to_version" => Some(new Proc("rollback_to_version",
        Array(p("table", StringType), p("version", LongType)),
        StructType(Seq(StructField("previous_version", LongType),
          StructField("current_version", LongType))),
        resolve,
        (t, in) => {
          val prev = t.latest.map(_.version).getOrElse(0L)
          Seq(prev, t.rollbackTo(in.getLong(1)).version)
        }))

      case _ => None
    }

  val Names: Seq[String] = Seq("compact", "expire_snapshots",
    "remove_orphan_files", "set_partition_spec", "rollback_to_version",
    "rewrite_position_deletes", "rewrite_equality_deletes", "create_tag", "drop_tag",
    "refresh_view", "add_files", "clone", "add_check", "drop_check",
    "set_autocompact")
}
