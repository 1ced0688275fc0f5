package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{ResolvedIdentifier, UnresolvedAttribute}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.QueryPlan
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.BooleanType
import graft.lake.{LakeDml, WriteMode}
import graft.lake.sqlcat.{GraftCatalog, GraftSparkTable}

/** Post-hoc analyzer rule wiring SQL onto the lake layer — the
  * capability the reference's `IcebergSparkSessionExtensions` +
  * `SparkCatalog` pair provides
  * (/root/reference/dags/utils/constants/constant.py:43-50):
  *
  *  - SELECT over `graft.ns.t` (incl. `FOR VERSION AS OF`): the DSv2
  *    relation is swapped for the snapshot's scan plan, aliased back
  *    to the relation's exprIds so the surrounding resolved query is
  *    untouched (Delta's V1-fallback shape). Every query re-resolves
  *    the table, so SQL always sees the LIVE snapshot — no stale
  *    views.
  *  - INSERT INTO / `writeTo(...).append` → lake Append commit;
  *    INSERT OVERWRITE (full) → Overwrite commit preserving the spec;
  *    CREATE TABLE AS SELECT → create + Overwrite.
  *  - DELETE / UPDATE / MERGE INTO → [[LakeDml]] copy-on-write
  *    snapshots. Conditions and SET expressions are rebound by column
  *    name (lake schemas are flat); MERGE supports the canonical
  *    equality-keyed form — `ON t.k = s.k [AND …]`, `WHEN MATCHED
  *    THEN UPDATE SET …`, `WHEN NOT MATCHED THEN INSERT *` — and
  *    rejects other shapes with an explicit error rather than
  *    guessing. Note [[LakeDml.merge]] joins null-safely: `ON` key
  *    equality treats NULL keys as matching (Iceberg's `=` would
  *    not) — irrelevant for non-null keys.
  *
  * Rewrites happen in post-hoc resolution, before CheckAnalysis would
  * reject the capability-less [[GraftSparkTable]], so no DSv2
  * read/write implementation is needed: correctness rides on the
  * already-oracle-verified lake read/commit paths.
  */
class LakeSqlRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def gstOf(p: LogicalPlan): Option[(DataSourceV2Relation, GraftSparkTable)] =
    p.collectFirst {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftSparkTable] =>
        (r, r.table.asInstanceOf[GraftSparkTable])
    }

  /** Metadata tables (`t.files` etc.) are read-only projections. */
  private def requireDataTable(gst: GraftSparkTable, what: String): GraftSparkTable = {
    if (gst.metaFrame.isDefined) throw new UnsupportedOperationException(
      s"$what on metadata table ${gst.name()} is not supported (read-only)")
    gst
  }

  /** Simple comparison conjuncts of a SQL filter as [[graft.lake.LakePredicate]]s
    * — the handle that buys SQL reads the SAME hidden-partition dir
    * pruning and manifest file skipping the programmatic `scan(preds)`
    * path gets. Sound by construction: every extracted predicate is
    * IMPLIED by the original filter (strict bounds relax to inclusive
    * ones), the filter itself stays in the plan for exact semantics,
    * and scan() only ever uses predicates to DROP provably-dead
    * dirs/files.
    */
  private def lakePreds(cond: Expression,
                        r: DataSourceV2Relation): Seq[graft.lake.LakePredicate] =
    graft.lake.PredicateExtract.extract(cond, r.outputSet)

  /** Replace a graft DSv2 relation with the snapshot scan plan, keeping
    * the relation's output exprIds (the resolved query above references
    * them).
    */
  private def readPlan(r: DataSourceV2Relation, gst: GraftSparkTable,
                       preds: Seq[graft.lake.LakePredicate] = Nil): LogicalPlan = {
    val child = gst.branchFrame.orElse(gst.metaFrame)
      .getOrElse(gst.lake.scan(preds, gst.pinnedVersion))
      .queryExecution.analyzed
    val resolver = spark.sessionState.conf.resolver
    val out = r.output.map { attr =>
      val src = child.output.find(a => resolver(a.name, attr.name)).getOrElse(
        throw new IllegalStateException(
          s"column ${attr.name} missing from lake read of ${gst.name()}"))
      Alias(src, attr.name)(exprId = attr.exprId, qualifier = attr.qualifier)
    }
    val proj = Project(out, child)
    // a FULL data-table read can answer count(*)/min/max from
    // manifests — tag the substitution (root AND scan plan: optimizer
    // rules mint fresh Projects that drop tags) for MetadataCountRule
    if (preds.isEmpty && gst.metaFrame.isEmpty && gst.branchFrame.isEmpty) {
      val lake = gst.lake
      val pinned = gst.pinnedVersion
      val answers = MetadataAgg.Answers(
        () => scala.util.Try(lake.metadataRowCount(pinned)).toOption.flatten,
        col => scala.util.Try(lake.metadataBounds(col, pinned)).toOption.flatten)
      proj.setTagValue(MetadataAgg.Tag, answers)
      child.setTagValue(MetadataAgg.Tag, answers)
    }
    proj
  }

  /** The relation under a (possibly aliased) filter child — the
    * analyzer wraps every catalog table in `SubqueryAlias` layers,
    * which preserve exprIds, so predicates resolved against the alias
    * still name the relation's attributes.
    */
  @annotation.tailrec
  private def throughAliases(p: LogicalPlan): LogicalPlan = p match {
    case SubqueryAlias(_, c) => throughAliases(c)
    case other               => other
  }

  private def substituteReads(plan: LogicalPlan): LogicalPlan = plan.transform {
    // WHERE over the (aliased) relation — the analyzer's shape for
    // SELECT ... WHERE: push its comparison conjuncts into the scan
    // so manifests prune dirs/files BEFORE the relation is built; the
    // filter stays above for exact semantics
    case Filter(cond, child) if (throughAliases(child) match {
          case r: DataSourceV2Relation => r.table.isInstanceOf[GraftSparkTable]
          case _                       => false
        }) =>
      val r = throughAliases(child).asInstanceOf[DataSourceV2Relation]
      val gst = r.table.asInstanceOf[GraftSparkTable]
      val swapped = child.transform {
        case rr: DataSourceV2Relation if rr eq r =>
          readPlan(r, gst, lakePreds(cond, r))
      }
      Filter(cond, swapped)
    case r: DataSourceV2Relation if r.table.isInstanceOf[GraftSparkTable] =>
      readPlan(r, r.table.asInstanceOf[GraftSparkTable])
  }

  private def noSubqueries(e: Expression, what: String): Unit =
    if (e.exists(_.isInstanceOf[SubqueryExpression]))
      throw new UnsupportedOperationException(
        s"$what with subqueries is not supported on graft tables")

  /** Rebind a resolved expression to plain column names (source-side
    * attributes get the `_src_` prefix [[LakeDml.merge]] exposes).
    */
  private def rebind(e: Expression, srcSet: AttributeSet = AttributeSet.empty): Column =
    GraftColumnBridge.column(e.transform {
      case a: AttributeReference =>
        if (srcSet.contains(a)) UnresolvedAttribute(Seq("_src_" + a.name))
        else UnresolvedAttribute(Seq(a.name))
    })

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other     => Seq(other)
  }

  @scala.annotation.tailrec
  private def stripCast(e: Expression): Expression = e match {
    case c: Cast => stripCast(c.child)
    case other   => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case a: AppendData =>
      gstOf(a.table) match {
        case Some((_, gst)) => GraftWriteCommand(requireDataTable(gst, "INSERT"), substituteReads(a.query), overwrite = false)
        case None           => substituteReads(plan)
      }

    case o: OverwriteByExpression =>
      gstOf(o.table) match {
        case Some((_, gst0)) =>
          val gst = requireDataTable(gst0, "INSERT OVERWRITE")
          o.deleteExpr match {
            case Literal(true, BooleanType) => ()
            case other => throw new UnsupportedOperationException(
              s"conditional INSERT OVERWRITE ($other) on graft tables: use DELETE + INSERT or LakeDml")
          }
          GraftWriteCommand(gst, substituteReads(o.query), overwrite = true)
        case None => substituteReads(plan)
      }

    case c: CreateTableAsSelect =>
      c.name match {
        case ResolvedIdentifier(cat: GraftCatalog, ident) =>
          GraftCtasCommand(cat, ident,
            c.partitioning.map(GraftSparkTable.transformToSpec),
            substituteReads(c.query), c.ignoreIfExists)
        case _ => substituteReads(plan)
      }

    case d: DeleteFromTable =>
      gstOf(d.table) match {
        case Some((_, gst0)) =>
          val gst = requireDataTable(gst0, "DELETE")
          noSubqueries(d.condition, "DELETE")
          GraftDeleteCommand(gst, rebind(d.condition))
        case None => substituteReads(plan)
      }

    case u: UpdateTable =>
      gstOf(u.table) match {
        case Some((_, gst0)) =>
          val gst = requireDataTable(gst0, "UPDATE")
          u.condition.foreach(noSubqueries(_, "UPDATE"))
          val set = u.assignments.map { as =>
            val name = stripCast(as.key) match {
              case a: AttributeReference => a.name
              case other => throw new UnsupportedOperationException(
                s"UPDATE of non-column $other on graft tables")
            }
            noSubqueries(as.value, "UPDATE SET")
            name -> rebind(as.value)
          }.toMap
          GraftUpdateCommand(gst,
            u.condition.map(rebind(_)).getOrElse(org.apache.spark.sql.functions.lit(true)),
            set)
        case None => substituteReads(plan)
      }

    case m: MergeIntoTable =>
      gstOf(m.targetTable) match {
        case Some((tRel, gst0)) =>
          val gst = requireDataTable(gst0, "MERGE INTO")
          val tgtSet = AttributeSet(tRel.output)
          val srcSet = m.sourceTable.outputSet
          def unsupported(msg: String): Nothing =
            throw new UnsupportedOperationException(
              s"MERGE INTO graft tables supports ON key equality + WHEN MATCHED " +
                s"[AND cond THEN DELETE /] UPDATE + WHEN NOT MATCHED INSERT *; $msg")
          noSubqueries(m.mergeCondition, "MERGE ON")
          val keys = conjuncts(m.mergeCondition).map { c =>
            val (l, r) = c match {
              case EqualTo(l, r)       => (stripCast(l), stripCast(r))
              case EqualNullSafe(l, r) => (stripCast(l), stripCast(r))
              case other               => unsupported(s"non-equality ON conjunct: $other")
            }
            (l, r) match {
              case (a: AttributeReference, b: AttributeReference) =>
                val (t, s) =
                  if (tgtSet.contains(a) && srcSet.contains(b)) (a, b)
                  else if (tgtSet.contains(b) && srcSet.contains(a)) (b, a)
                  else unsupported(s"ON conjunct not target=source: $c")
                if (!spark.sessionState.conf.resolver(t.name, s.name))
                  unsupported(s"ON keys must share a name, got ${t.name}=${s.name}")
                t.name
              case _ => unsupported(s"ON conjunct not column=column: $c")
            }
          }
          if (m.notMatchedBySourceActions.nonEmpty)
            unsupported("WHEN NOT MATCHED BY SOURCE is not supported")
          def setOf(ua: UpdateAction): Map[String, Column] =
            ua.assignments.map { as =>
              val name = stripCast(as.key) match {
                case a: AttributeReference => a.name
                case other => unsupported(s"UPDATE of non-column $other")
              }
              noSubqueries(as.value, "MERGE UPDATE SET")
              name -> rebind(as.value, srcSet)
            }.toMap
          // matched rows keep the target values when no UPDATE applies —
          // an identity assignment on a key column expresses that
          // through LakeDml's set-path
          val keepSet: Map[String, Column] =
            Map(keys.head -> org.apache.spark.sql.functions.col(keys.head))
          def delCondOf(da: DeleteAction): Column = {
            da.condition.foreach(noSubqueries(_, "MERGE DELETE"))
            da.condition.map(rebind(_, srcSet))
              .getOrElse(org.apache.spark.sql.functions.lit(true))
          }
          val (set, deleteMatched): (Map[String, Column], Option[Column]) =
            m.matchedActions match {
              case Nil => (keepSet, None)
              case Seq(ua: UpdateAction) if ua.condition.isEmpty => (setOf(ua), None)
              case Seq(da: DeleteAction) => (keepSet, Some(delCondOf(da)))
              // WHEN MATCHED AND c THEN DELETE, WHEN MATCHED THEN UPDATE:
              // first matching action wins, so the UPDATE covers !c
              case Seq(da: DeleteAction, ua: UpdateAction)
                  if da.condition.nonEmpty && ua.condition.isEmpty =>
                (setOf(ua), Some(delCondOf(da)))
              case other => unsupported(s"matched actions: $other")
            }
          val insert = m.notMatchedActions match {
            case Nil => false
            case Seq(ia: InsertAction) if ia.condition.isEmpty =>
              // must be the INSERT * shape: each target column takes the
              // same-name source column (LakeDml inserts by name)
              ia.assignments.foreach { as =>
                (stripCast(as.key), stripCast(as.value)) match {
                  case (k: AttributeReference, v: AttributeReference)
                    if spark.sessionState.conf.resolver(k.name, v.name) && srcSet.contains(v) => ()
                  case (k, v) => unsupported(s"non-identity INSERT assignment: $k = $v")
                }
              }
              true
            case other => unsupported(s"not-matched actions: $other")
          }
          GraftMergeCommand(gst, substituteReads(m.sourceTable), keys, set, insert,
            deleteMatched)
        case None => substituteReads(plan)
      }

    case other => substituteReads(other)
  }
}

/** Append / full-overwrite commit from a SQL write plan. */
case class GraftWriteCommand(table: GraftSparkTable, query: LogicalPlan,
                             overwrite: Boolean) extends LeafRunnableCommand {
  override def innerChildren: Seq[QueryPlan[_]] = Seq(query)
  override def run(session: SparkSession): Seq[Row] = {
    val df = GraftColumnBridge.dataFrame(session, query)
    if (overwrite)
      table.lake.write(df, WriteMode.Overwrite,
        table.lake.latest.map(_.partitionBy).getOrElse(Nil))
    else table.lake.write(df, WriteMode.Append)
    Nil
  }
}

/** CREATE TABLE AS SELECT → spec'd overwrite into a fresh table. */
case class GraftCtasCommand(catalog: GraftCatalog, ident: Identifier,
                            partitionSpec: Seq[String], query: LogicalPlan,
                            ignoreIfExists: Boolean) extends LeafRunnableCommand {
  override def innerChildren: Seq[QueryPlan[_]] = Seq(query)
  override def run(session: SparkSession): Seq[Row] = {
    val lt = catalog.lakeFor(ident)
    if (lt.latest.nonEmpty) {
      if (ignoreIfExists) return Nil
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(ident.toString)
    }
    lt.write(GraftColumnBridge.dataFrame(session, query), WriteMode.Overwrite, partitionSpec)
    Nil
  }
}

case class GraftDeleteCommand(table: GraftSparkTable, cond: Column)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    LakeDml.delete(table.lake, cond); Nil
  }
}

case class GraftUpdateCommand(table: GraftSparkTable, cond: Column,
                              set: Map[String, Column]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    LakeDml.update(table.lake, cond, set); Nil
  }
}

case class GraftMergeCommand(table: GraftSparkTable, source: LogicalPlan,
                             keys: Seq[String], set: Map[String, Column],
                             insertNotMatched: Boolean,
                             deleteMatched: Option[Column] = None)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[QueryPlan[_]] = Seq(source)
  override def run(session: SparkSession): Seq[Row] = {
    LakeDml.merge(table.lake, GraftColumnBridge.dataFrame(session, source),
      keys, set, insertNotMatched, deleteMatched = deleteMatched)
    Nil
  }
}
