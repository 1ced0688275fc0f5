package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max => AggMax, Min => AggMin, Sum => AggSum}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import org.apache.spark.sql.GraftColumnBridge
import graft.lake.{IncrementalView, LakeCatalog}
import graft.lake.sqlcat.GraftSparkTable

/** Transparent materialized-view rewrite — the warehouse feature where
  * a query the user writes against the BASE table is answered from a
  * maintained aggregate view when one matches (Oracle query rewrite,
  * BigQuery/Redshift materialized-view smart tuning; the reference's
  * pipeline hand-routes readers at the Gold table instead,
  * /root/reference/dags/etl.py:80-96 — this closes that loop inside
  * the optimizer so readers need not know the view exists).
  *
  * Scope (sound-by-construction exact match, decline everything else):
  *   - `Aggregate` directly over a (aliased) graft catalog table —
  *     current version only (no time travel, branch, or metadata
  *     frame); one intervening `Filter` is admitted iff it is
  *     deterministic, subquery-free, and references ONLY view-key
  *     columns (it then partitions whole view groups and replays
  *     exactly on the view); no other intervening node;
  *   - grouping columns exactly the view's keys;
  *   - every output either a group key or one of the view's
  *     maintained aggregates — `count(*)`, `sum/min/max/avg(expr)`
  *     with the expr semantically equal to the registered spec —
  *     optionally under outer `CAST`s; no DISTINCT, no FILTER clause;
  *   - the view is FRESH: its recorded source version equals the
  *     base table's current version. A stale view silently declines
  *     (the scan path is always correct) — refresh-then-query gets
  *     the rewrite, trickle-then-query gets the scan.
  *
  * At 100 TB this is [[MetadataAgg]]'s big sibling: a grouped rollup
  * the pipeline already maintains incrementally answers in
  * O(|groups|) instead of a full fact scan, and the optimizer —
  * not every reader — carries the knowledge of that equivalence.
  */
object ViewRewrite {
  /** A registered rewrite target: `viewIdent` (under `warehouse`)
    * maintains `aggSpecs` grouped by `keys` over `sourceIdent`.
    */
  final case class Reg(warehouse: String, sourceIdent: String,
                       viewIdent: String, keys: Seq[String],
                       aggSpecs: Seq[String])

  // keyed by the source table's qualified root location — the stable
  // identity a DSv2 relation's LakeTable exposes regardless of which
  // catalog name the session mounted the warehouse under
  private val registry = new ConcurrentHashMap[String, Reg]()

  /** Register a [[IncrementalView.refreshSql]]-created view for
    * rewrite; the definition (source, keys, aggs) is read from the
    * view's own persisted snapshot meta, so registration cannot drift
    * from what the view actually maintains.
    */
  def register(cat: LakeCatalog, viewIdent: String): Reg = {
    val defJson = cat.table(viewIdent).latestMeta(IncrementalView.DefinitionKey)
      .getOrElse(throw new IllegalArgumentException(
        s"'$viewIdent' has no persisted view definition; create it with refreshSql()"))
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.readTree(defJson)
    import scala.jdk.CollectionConverters._
    val reg = Reg(cat.warehouse, node.get("source").asText(), viewIdent,
      node.get("keys").elements().asScala.map(_.asText()).toSeq,
      node.get("aggs").elements().asScala.map(_.asText()).toSeq)
    registry.put(cat.table(reg.sourceIdent).rootLocation, reg)
    reg
  }

  def deregister(cat: LakeCatalog, sourceIdent: String): Unit =
    registry.remove(cat.table(sourceIdent).rootLocation)

  def clear(): Unit = registry.clear()

  private[plans] def lookup(rootLocation: String): Option[Reg] =
    Option(registry.get(rootLocation))
}

/** The optimizer face of [[ViewRewrite]] — injected in post-hoc
  * resolution BEFORE [[LakeSqlRule]], so a matched Aggregate swaps to
  * the view read while the base table is still a recognizable
  * [[GraftSparkTable]] relation (after LakeSqlRule's substitution the
  * identity is gone).
  */
class ViewRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {

  @annotation.tailrec
  private def throughAliases(p: LogicalPlan): LogicalPlan = p match {
    case SubqueryAlias(_, c) => throughAliases(c)
    case other               => other
  }

  /** Resolve a registered agg-spec expression against the base
    * relation's attributes THROUGH THE REAL ANALYZER — hand
    * substitution is not enough, because the query side carries
    * analyzer-inserted details (Cast evalMode/timezone, function
    * resolution, type coercion) that `semanticEquals` rightly
    * distinguishes. Declines (None) on anything that does not
    * resolve — matching must never guess.
    */
  private def resolveSpec(c: org.apache.spark.sql.Column,
                          rel: DataSourceV2Relation): Option[Expression] =
    scala.util.Try {
      // the Dataset API path, not raw analyzer.execute: a Column is a
      // lazy ColumnNode in Spark 4 and only select() converts+analyzes
      GraftColumnBridge.dataFrame(spark, rel).select(c.as("_spec"))
        .queryExecution.analyzed.collectFirst {
          case Project(Seq(Alias(child, "_spec")), _) => child
        }
    }.toOption.flatten.filter(_.resolved)

  /** The view column (by out-name) for one query aggregate function,
    * or None when the view does not maintain it.
    */
  private def matchAgg(fn: Expression, specs: Seq[(IncrementalView.ViewAgg, Option[Expression])]): Option[String] =
    fn match {
      case c: Count if c.children == Seq(Literal(1)) ||
                       c.children == Seq(Literal(1L)) =>
        specs.collectFirst { case (IncrementalView.GroupCount(o), _) => o }
      case s: AggSum =>
        specs.collectFirst {
          case (IncrementalView.Sum(_, o), Some(e)) if e.semanticEquals(s.child) => o }
      case m: AggMin =>
        specs.collectFirst {
          case (IncrementalView.Min(_, o), Some(e)) if e.semanticEquals(m.child) => o }
      case m: AggMax =>
        specs.collectFirst {
          case (IncrementalView.Max(_, o), Some(e)) if e.semanticEquals(m.child) => o }
      case a: Average =>
        specs.collectFirst {
          case (IncrementalView.Avg(_, o), Some(e)) if e.semanticEquals(a.child) => o }
      case _ => None
    }

  /** Outer Cast chain (outermost first) around the core expression. */
  @annotation.tailrec
  private def stripCasts(e: Expression, acc: List[Cast] = Nil): (List[Cast], Expression) =
    e match {
      case c: Cast => stripCasts(c.child, c :: acc)
      case other   => (acc.reverse, other)
    }

  private def reapply(casts: List[Cast], core: Expression): Expression =
    casts.foldRight(core)((c, inner) => c.withNewChildren(Seq(inner)))

  private def dbg(msg: => String): Unit =
    if (sys.env.contains("GRAFT_VIEWRW_DEBUG")) System.err.println(s"[viewrw] $msg")

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = {
    // an optional WHERE between the Aggregate and the base relation is
    // admissible when it references ONLY view-key columns (checked
    // below, once the registration is known)
    val (filterCond, belowFilter) = throughAliases(agg.child) match {
      case Filter(cond, fchild) => (Some(cond), throughAliases(fchild))
      case other                => (None, other)
    }
    val rel = belowFilter match {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftSparkTable] => r
      case other => dbg(s"child not a graft relation: ${other.getClass.getSimpleName}"); return None
    }
    val gst = rel.table.asInstanceOf[GraftSparkTable]
    // current-version data reads only: a pinned/branch/metadata read
    // has different contents than the view's maintained state
    if (gst.pinnedVersion.isDefined || gst.branchFrame.isDefined ||
        gst.metaFrame.isDefined) { dbg("pinned/branch/meta read"); return None }
    val reg = ViewRewrite.lookup(gst.lake.rootLocation).getOrElse {
      dbg(s"no registration for ${gst.lake.rootLocation}"); return None }

    // freshness: the view must reflect exactly the base's current
    // version — otherwise answering from it would time-travel the user
    val cat = new LakeCatalog(spark, reg.warehouse)
    val viewT = cat.table(reg.viewIdent)
    val fresh = (for {
      recorded <- viewT.latestMeta(IncrementalView.SourceVersionKey)
      current  <- gst.lake.latest.map(_.version)
    } yield recorded.toLong == current).getOrElse(false)
    if (!fresh) { dbg("view stale"); return None }

    // grouping: plain columns, each a DISTINCT view key. All keys →
    // the view rows ARE the answer (project); a strict subset → the
    // answer is an exact ROLLUP of view rows (count composes as
    // sum-of-counts, sum as sum-of-sums, min/max as min/max-of) —
    // every base row lives in exactly one view group, so regrouping
    // the view regroups the base
    val resolver = spark.sessionState.conf.resolver
    val groupAttrs = agg.groupingExpressions.map {
      case a: AttributeReference => a
      case other => dbg(s"non-attr grouping: $other"); return None
    }
    if (groupAttrs.map(_.name.toLowerCase).distinct.size != groupAttrs.size ||
        !groupAttrs.forall(a => reg.keys.exists(k => resolver(a.name, k)))) {
      dbg(s"group mismatch: ${groupAttrs.map(_.name)} vs ${reg.keys}"); return None }
    val exact = groupAttrs.size == reg.keys.size

    val specs: Seq[(IncrementalView.ViewAgg, Option[Expression])] =
      IncrementalView.parseAggs(reg.aggSpecs).map {
        case g: IncrementalView.GroupCount => (g, None)
        case s: IncrementalView.Sum =>
          (s, Some(resolveSpec(s.expr, rel).getOrElse(return None)))
        case m: IncrementalView.Min =>
          (m, Some(resolveSpec(m.expr, rel).getOrElse(return None)))
        case m: IncrementalView.Max =>
          (m, Some(resolveSpec(m.expr, rel).getOrElse(return None)))
        case a: IncrementalView.Avg =>
          (a, Some(resolveSpec(a.expr, rel).getOrElse(return None)))
      }

    val viewPlan = IncrementalView.read(cat, reg.viewIdent).queryExecution.analyzed
    def viewCol(name: String): Option[Attribute] =
      viewPlan.output.find(a => resolver(a.name, name))

    // a WHERE referencing ONLY view-key columns keeps or drops WHOLE
    // view groups (every base row of a group shares its key values
    // verbatim), so replaying the predicate on the view's key columns
    // is exact — before OR after the rollup re-aggregation alike.
    // Anything else (a measure column, a subquery, a nondeterministic
    // term) declines: the view has already collapsed the rows the
    // predicate would need to see
    val viewFilter: Option[Expression] = filterCond match {
      case None => None
      case Some(cond) =>
        if (!cond.deterministic) { dbg("nondeterministic filter"); return None }
        if (cond.exists(_.isInstanceOf[SubqueryExpression])) {
          dbg("subquery in filter"); return None }
        if (!cond.references.forall(a => reg.keys.exists(k => resolver(a.name, k)))) {
          dbg(s"filter over non-key columns: ${cond.references.toSeq.map(_.name)}")
          return None }
        Some(cond.transform {
          case a: AttributeReference => viewCol(a.name).getOrElse(return None)
        })
    }

    // one matched aggregate, in the two grouping regimes: exact keys
    // read the maintained column as-is; a key subset re-aggregates it
    // (avg declines on subsets — its sum/count components are hidden
    // maintenance columns the view read does not expose)
    def rollup(ae: AggregateExpression, out: String): Option[Expression] = {
      val src = viewCol(out).getOrElse(return None)
      if (exact) return Some(cast(src, ae.dataType))
      val fn = ae.aggregateFunction match {
        case _: Count | _: AggSum => AggSum(src)
        case _: AggMin            => AggMin(src)
        case _: AggMax            => AggMax(src)
        case other => dbg(s"no subset-rollup for $other"); return None
      }
      Some(cast(AggregateExpression(fn, ae.mode, isDistinct = false), ae.dataType))
    }

    // every output must map onto the view; otherwise decline whole
    val mapped: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: AttributeReference if groupAttrs.exists(_.exprId == a.exprId) =>
        Alias(cast(viewCol(a.name).getOrElse(return None), a.dataType),
          a.name)(exprId = a.exprId)
      case al @ Alias(child, name) =>
        val (casts, core) = stripCasts(child)
        val replaced: Expression = core match {
          case g: AttributeReference if groupAttrs.exists(_.exprId == g.exprId) =>
            cast(viewCol(g.name).getOrElse(return None), g.dataType)
          case ae: AggregateExpression
              if !ae.isDistinct && ae.filter.isEmpty =>
            val out = matchAgg(ae.aggregateFunction, specs).getOrElse {
              dbg(s"no view agg for ${ae.aggregateFunction}"); return None }
            rollup(ae, out).getOrElse(return None)
          case other => dbg(s"unmatchable output core: $other"); return None
        }
        Alias(reapply(casts, replaced), name)(exprId = al.exprId)
      case other => dbg(s"unmatchable output: $other"); return None
    }
    val filteredView = viewFilter.map(Filter(_, viewPlan)).getOrElse(viewPlan)
    if (exact) Some(Project(mapped, filteredView))
    else {
      val groupCols = groupAttrs.map(a => viewCol(a.name).getOrElse(return None))
      Some(Aggregate(groupCols, mapped, filteredView))
    }
  }

  /** Value-preserving alignment when the maintained column's physical
    * type differs from the query's aggregate type (e.g. a merge-time
    * decimal widening): the true aggregate over the same rows fits the
    * query's own result type by definition, so the cast is exact.
    */
  private def cast(e: Expression, to: org.apache.spark.sql.types.DataType): Expression =
    if (e.dataType == to) e else Cast(e, to)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg: Aggregate => tryRewrite(agg).getOrElse(agg)
  }
}
