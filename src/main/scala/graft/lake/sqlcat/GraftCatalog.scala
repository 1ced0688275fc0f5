package graft.lake.sqlcat

import java.util
import scala.jdk.CollectionConverters._
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.lake.{LakeCatalog, LakeTable, PartitionField}

/** DSv2 `TableCatalog` over the graft lake layer — the live catalog
  * resolution the reference gets from Iceberg's `SparkCatalog`
  * (`spark.sql.catalog.my_catalog`, /root/reference/dags/etl.py:49-54):
  * `spark.sql("SELECT … FROM graft.ns.t")` resolves the CURRENT
  * snapshot at every query (no stale temp views), `FOR VERSION AS OF`
  * time-travels, and DDL (`CREATE/DROP TABLE`) manages lake tables.
  *
  * Reads and writes execute through the proven lake read/commit paths:
  * [[graft.plans.LakeSqlRule]] swaps the DSv2 relation for the
  * snapshot's scan plan (same V1-fallback shape Delta uses), so this
  * class only carries identity + metadata.
  *
  * Register (any name, lazily instantiated on first reference):
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.graft.warehouse", "/path/wh")
  * }}}
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces with ProcedureCatalog {
  private var catName: String = _
  private var warehouse: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catName = name
    warehouse = options.get("warehouse")
    require(warehouse != null && warehouse.nonEmpty,
      s"catalog $name needs spark.sql.catalog.$name.warehouse")
  }

  override def name(): String = catName

  private def lakeCat: LakeCatalog = new LakeCatalog(SparkSession.active, warehouse)

  private def identString(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString(".")

  private def lakeTable(ident: Identifier): LakeTable = lakeCat.table(identString(ident))

  /** Lake handle for command execution ([[graft.plans.GraftCtasCommand]]). */
  private[graft] def lakeFor(ident: Identifier): LakeTable = lakeTable(ident)

  override def tableExists(ident: Identifier): Boolean =
    lakeTable(ident).latest.nonEmpty

  override def loadTable(ident: Identifier): Table = {
    val t = lakeTable(ident)
    if (t.latest.nonEmpty)
      return new GraftSparkTable(s"$catName.${identString(ident)}", t, None)
    // metadata-table addressing (Iceberg parity): `ns.t.files`,
    // `ns.t.partitions`, `ns.t.snapshots`, `ns.t.history` resolve
    // against the parent table when `ns.t` exists
    if (ident.namespace().nonEmpty &&
        GraftSparkTable.MetaTables.contains(ident.name().toLowerCase)) {
      val parent = Identifier.of(ident.namespace().init, ident.namespace().last)
      val pt = lakeTable(parent)
      if (pt.latest.nonEmpty)
        return new GraftSparkTable(s"$catName.${identString(ident)}", pt, None,
          metaTable = Some(ident.name().toLowerCase))
    }
    throw new NoSuchTableException(ident)
  }

  /** `FOR VERSION AS OF n` time travel — a snapshot number, or a TAG
    * name (`VERSION AS OF 'release-1'`), Iceberg's ref-based travel.
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val t = lakeTable(ident)
    // ref-based travel resolves branches too: `VERSION AS OF 'audit'`
    // reads the branch head (Iceberg's branch read surface)
    if (version.toLongOption.isEmpty && t.branchBase(version).nonEmpty)
      return new GraftSparkTable(s"$catName.${identString(ident)}@$version", t, None,
        branchName = Some(version))
    val v = version.toLongOption
      .orElse(t.tagVersion(version))
      .getOrElse(throw new IllegalArgumentException(
        s"graft version must be a snapshot number, tag or branch name, got '$version'"))
    if (t.history.forall(_.version != v)) throw new NoSuchTableException(ident)
    new GraftSparkTable(s"$catName.${identString(ident)}@v$v", t, Some(v))
  }

  /** `FOR TIMESTAMP AS OF ts` time travel. DSv2 hands the travel time
    * as MICROseconds since epoch; manifests stamp milliseconds.
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val t = lakeTable(ident)
    val ms = Math.floorDiv(timestamp, 1000L)
    val v = t.versionAt(ms).getOrElse(throw new NoSuchTableException(ident))
    new GraftSparkTable(s"$catName.${identString(ident)}@t$ms", t, Some(v))
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    val t = lakeTable(ident)
    if (t.latest.nonEmpty) throw new TableAlreadyExistsException(ident.toString)
    t.create(schema, partitions.map(GraftSparkTable.transformToSpec).toSeq,
      meta = properties.asScala.toMap)
    new GraftSparkTable(s"$catName.${identString(ident)}", t, None)
  }

  /** `ALTER TABLE … ADD/RENAME/DROP/ALTER COLUMN` → the lake layer's
    * metadata-only field-id evolution commits. Top-level columns only
    * (lake schemas are flat).
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val t = lakeTable(ident)
    if (t.latest.isEmpty) throw new NoSuchTableException(ident)
    def topLevel(fieldNames: Array[String], what: String): String = {
      require(fieldNames.length == 1,
        s"$what on nested field ${fieldNames.mkString(".")} is not supported")
      fieldNames(0)
    }
    changes.foreach {
      case r: TableChange.RenameColumn =>
        t.renameColumn(topLevel(r.fieldNames(), "RENAME COLUMN"), r.newName())
      case d: TableChange.DeleteColumn =>
        t.dropColumn(topLevel(d.fieldNames(), "DROP COLUMN"))
      case u: TableChange.UpdateColumnType =>
        t.widenColumn(topLevel(u.fieldNames(), "ALTER COLUMN TYPE"), u.newDataType())
      case a: TableChange.AddColumn =>
        t.addColumn(topLevel(a.fieldNames(), "ADD COLUMN"), a.dataType())
      case other =>
        throw new UnsupportedOperationException(s"unsupported table change: $other")
    }
    loadTable(ident)
  }

  // -- SQL maintenance procedures (`CALL graft.system.compact(...)`) ------

  /** Iceberg-style `system` namespace; a bare name also resolves. */
  private def isSystemNs(ns: Array[String]): Boolean =
    ns.isEmpty || (ns.length == 1 && ns(0).equalsIgnoreCase("system"))

  override def loadProcedure(ident: Identifier): org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    if (!isSystemNs(ident.namespace()))
      throw new UnsupportedOperationException(
        s"no procedure namespace ${ident.namespace().mkString(".")} in catalog $catName (use $catName.system)")
    GraftProcedures.load(ident.name(), s => lakeCat.table(s), () => lakeCat).getOrElse(
      throw new UnsupportedOperationException(
        s"no procedure ${ident.name()} in catalog $catName (have: ${GraftProcedures.Names.mkString(", ")})"))
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (!isSystemNs(namespace)) Array.empty
    else GraftProcedures.Names.map(Identifier.of(Array("system"), _)).toArray

  // -- warehouse filesystem (any Hadoop scheme) ---------------------------

  private def whPath(parts: String*): HPath =
    new HPath((warehouse.stripSuffix("/") +: parts).mkString("/"))
  private def io = new graft.lake.LakeIo(
    whPath().getFileSystem(SparkSession.active.sessionState.newHadoopConf()))

  override def dropTable(ident: Identifier): Boolean = {
    val t = lakeTable(ident)
    val existed = t.latest.nonEmpty
    if (existed) t.io.delete(t.rootQ)
    existed
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = lakeTable(oldIdent)
    if (from.latest.isEmpty) throw new NoSuchTableException(oldIdent)
    val to = lakeTable(newIdent)
    if (to.latest.nonEmpty) throw new TableAlreadyExistsException(newIdent.toString)
    io.mkdirs(to.rootQ.getParent)
    io.move(from.rootQ, to.rootQ)
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = whPath(namespace: _*)
    if (!io.isDir(dir)) throw new NoSuchNamespaceException(namespace)
    io.list(dir)
      .filter(st => st.isDirectory && io.isDir(new HPath(st.getPath, "_versions")))
      .map(st => Identifier.of(namespace, st.getPath.getName))
      .toArray
  }

  // -- namespaces: directories under the warehouse ------------------------

  override def listNamespaces(): Array[Array[String]] =
    io.list(whPath())
      .filter(_.isDirectory)
      .map(st => Array(st.getPath.getName))
      .toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    io.isDir(whPath(namespace: _*))

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit =
    io.mkdirs(whPath(namespace: _*))

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val dir = whPath(namespace: _*)
    if (!io.isDir(dir)) return false
    if (!cascade)
      require(io.list(dir).isEmpty, s"namespace ${namespace.mkString(".")} is not empty")
    io.delete(dir)
  }
}

/** Catalog-resolved handle to a lake table: identity + live metadata.
  * No `SupportsRead`/`SupportsWrite` — [[graft.plans.LakeSqlRule]]
  * replaces relations/writes over this table with plans on the lake
  * layer's own read/commit paths before any capability is consulted.
  */
final class GraftSparkTable(tableName: String, val lake: LakeTable,
                            val pinnedVersion: Option[Long],
                            metaTable: Option[String] = None,
                            val branchName: Option[String] = None) extends Table {
  private def snap = branchName match {
    case Some(b) => lake.branchHead(b)
    case None => pinnedVersion match {
      case Some(v) => lake.history.find(_.version == v)
      case None    => lake.latest
    }
  }

  /** Branch-head read for `VERSION AS OF '<branch>'` handles. */
  def branchFrame: Option[org.apache.spark.sql.DataFrame] =
    branchName.map(lake.readBranch(_))

  /** The metadata frame this handle addresses (None = the data table).
    * Built fresh per call: metadata tables reflect the live state.
    */
  def metaFrame: Option[org.apache.spark.sql.DataFrame] = metaTable.map {
    case "files"      => lake.files(pinnedVersion)
    case "partitions" => lake.partitionsTable(pinnedVersion)
    case "refs"       => lake.refsTable
    case _            => lake.snapshots // "snapshots" and "history"
  }

  override def name(): String = tableName
  override def schema(): StructType =
    metaFrame.map(_.schema)
      .orElse(snap.map(_.schema)).getOrElse(new StructType())
  override def capabilities(): util.Set[TableCapability] = util.Collections.emptySet()

  override def partitioning(): Array[Transform] =
    snap.map(_.partitionBy).getOrElse(Nil).map { spec =>
      PartitionField.parse(spec) match {
        case PartitionField.Identity(c)    => Expressions.identity(c)
        case PartitionField.Days(c)        => Expressions.days(c)
        case PartitionField.Months(c)      => Expressions.months(c)
        case PartitionField.Bucket(n, c)   => Expressions.bucket(n, c)
        case PartitionField.Truncate(w, c) =>
          Expressions.apply("truncate", Expressions.literal(w), Expressions.column(c))
      }
    }.toArray

  override def properties(): util.Map[String, String] = {
    val m = new util.HashMap[String, String]()
    m.put(TableCatalog.PROP_PROVIDER, "graft")
    m.put(TableCatalog.PROP_LOCATION, lake.rootLocation)
    snap.foreach(s => m.put("graft.snapshot.version", s.version.toString))
    m
  }
}

object GraftSparkTable {
  /** Addressable metadata tables (Iceberg's inspection-table names). */
  val MetaTables: Set[String] = Set("files", "partitions", "snapshots", "history", "refs")

  /** DSv2 partition Transform → manifest spec string. */
  def transformToSpec(t: Transform): String = {
    def colOf(): String = {
      val refs = t.references()
      require(refs.length == 1, s"unsupported multi-column transform: $t")
      refs(0).fieldNames().mkString(".")
    }
    t.name() match {
      case "identity" => colOf()
      case "days"     => s"days(${colOf()})"
      case "months"   => s"months(${colOf()})"
      case "bucket" | "truncate" =>
        val lit = t.arguments().collectFirst {
          case l: org.apache.spark.sql.connector.expressions.Literal[_] => l.value().toString
        }.getOrElse(throw new IllegalArgumentException(s"missing width/count in $t"))
        s"${t.name()}($lit, ${colOf()})"
      case other =>
        throw new IllegalArgumentException(s"unsupported partition transform: $other")
    }
  }
}
