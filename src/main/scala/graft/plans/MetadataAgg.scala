package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag

/** Metadata-only `count(*)` over lake tables — the SQL face of
  * [[graft.lake.LakeTable.metadataRowCount]] and the optimization
  * Iceberg/Delta perform through DSv2 aggregate pushdown: a
  * predicate-free `SELECT count(*) FROM graft.ns.t` needs no scan at
  * all, because every commit records its dirs' exact row counts in
  * the manifest. At 100 TB that is the difference between a
  * metadata lookup and a 100 TB read that produces one number.
  *
  * [[LakeSqlRule]] tags the plan it substitutes for a FULL (predicate
  * -free, current-or-pinned-version) table read with a thunk that
  * answers the snapshot's row count from manifests — or None when
  * live delete files mean only a scan is exact. The optimizer rule
  * below folds `Aggregate(no grouping, only count(*)s, <tagged>)`
  * into a [[LocalRelation]] holding the answer. Anything it is not
  * certain of — a Filter/Limit/Generate on the path, count over a
  * column (null-skipping), DISTINCT, a FILTER clause, grouping — is
  * left untouched: soundness over coverage, and the scan path is
  * always correct.
  */
object MetadataAgg {
  /** Set by [[LakeSqlRule]] on full-table lake reads: () => exact row
    * count from manifests, None when deletes make it unsound.
    */
  val CountTag: TreeNodeTag[() => Option[Long]] =
    TreeNodeTag[() => Option[Long]]("graft.metadataCount")
}

class MetadataCountRule extends Rule[LogicalPlan] {
  import MetadataAgg.CountTag

  /** The nearest tagged node beneath cardinality-preserving nodes: a
    * Project is a 1:1 row map, so count over it equals count over its
    * child. Anything else (Filter/Join/Generate/Limit/...) stops the
    * descent. Intermediate Projects may be fresh nodes minted by
    * pruning/collapse rules (tags don't travel to NEW nodes), which
    * is why the substitution tags both its root and the scan plan
    * under it — one of the two survives rewrites that preserve this
    * shape.
    */
  @annotation.tailrec
  private def taggedBelow(p: LogicalPlan): Option[() => Option[Long]] =
    p.getTagValue(CountTag) match {
      case some @ Some(_) => some
      case None => p match {
        case pr: Project => taggedBelow(pr.child)
        case _           => None
      }
    }

  /** `count(*)` / `count(lit)` with no DISTINCT and no FILTER clause —
    * the aggregates whose answer is exactly "number of rows".
    */
  private def countStar(ne: NamedExpression): Boolean = ne match {
    case Alias(AggregateExpression(Count(Seq(Literal(v, _))), _, false, None, _), _) =>
      v != null
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(Seq(), exprs, child, _)
        if exprs.nonEmpty && exprs.forall(countStar) =>
      taggedBelow(child).flatMap(_.apply()) match {
        case Some(n) =>
          LocalRelation(agg.output,
            Seq(InternalRow.fromSeq(agg.output.map(_ => n))))
        case None => agg
      }
  }
}
