package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.types._

/** Metadata-only aggregates over lake tables — the SQL face of
  * [[graft.lake.LakeTable.metadataRowCount]]/[[graft.lake.LakeTable.metadataBounds]]
  * and the optimization Iceberg/Delta perform through DSv2 aggregate
  * pushdown: a predicate-free `SELECT count(*), min(x), max(x) FROM
  * graft.ns.t` needs no scan at all, because every commit records its
  * dirs' exact row counts and min/max stats in the manifest. At
  * 100 TB that is the difference between a metadata lookup and a
  * 100 TB read that produces one row.
  *
  * [[LakeSqlRule]] tags the plan it substitutes for a FULL (predicate
  * -free, current-or-pinned-version) table read with
  * [[MetadataAgg.Answers]] — manifest thunks that answer None
  * whenever metadata cannot be exact (live delete files; a column a
  * stats blob doesn't bound). The optimizer rule below folds
  * `Aggregate(no grouping, only answerable aggregates, <tagged>)`
  * into a [[LocalRelation]] holding the answers. Anything it is not
  * certain of — a Filter/Limit/Generate on the path, `count(col)`
  * (null-skipping), DISTINCT, a FILTER clause, grouping, min/max
  * over a computed expression or a string (parquet BINARY stats may
  * be truncated bounds) — declines to the scan path: soundness over
  * coverage, and the scan is always correct.
  */
object MetadataAgg {
  /** Manifest answers for one substituted full-table read: exact row
    * count, and exact numeric (min, max) per column — None whenever
    * only a scan is exact.
    */
  final case class Answers(
      count: () => Option[Long],
      bounds: String => Option[(BigDecimal, BigDecimal)])

  val Tag: TreeNodeTag[Answers] = TreeNodeTag[Answers]("graft.metadataAgg")
}

class MetadataCountRule extends Rule[LogicalPlan] {
  import MetadataAgg.{Answers, Tag}

  /** The nearest tagged node beneath cardinality-preserving Projects
    * (a Project is a 1:1 row map), plus the Project chain walked
    * through, topmost first — min/max targets are resolved through
    * the chain's aliases so a subquery rename (`SELECT min(x) FROM
    * (SELECT v AS x FROM t)`) still reaches the real column.
    * Intermediate Projects may be fresh nodes minted by pruning/
    * collapse rules (tags don't travel to NEW nodes), which is why
    * the substitution tags both its root and the scan plan under it.
    */
  private def findTagged(p: LogicalPlan): Option[(Answers, List[Project])] = {
    @annotation.tailrec
    def loop(p: LogicalPlan, chain: List[Project]): Option[(Answers, List[Project])] =
      p.getTagValue(Tag) match {
        case Some(a) => Some((a, chain.reverse))
        case None => p match {
          case pr: Project => loop(pr.child, pr :: chain)
          case _           => None
        }
      }
    loop(p, Nil)
  }

  /** Resolve an aggregate target through the Project chain down to
    * the tagged node: only a bare column reference (possibly renamed
    * by the chain) qualifies — any computation declines the fold.
    */
  private def resolveColumn(e: Expression, chain: List[Project]): Option[Attribute] = {
    val resolved = chain.foldLeft(e) { (cur, pr) =>
      val byId = pr.projectList.map {
        case al: Alias              => al.exprId -> al.child
        case ar: AttributeReference => ar.exprId -> ar
        case ne                     => ne.exprId -> ne.toAttribute
      }.toMap
      cur.transform {
        case ar: AttributeReference => byId.getOrElse(ar.exprId, ar)
      }
    }
    resolved match {
      case ar: AttributeReference => Some(ar)
      case _                      => None
    }
  }

  /** Stats keys → internal literal values, for the types whose stats
    * domain is exact and loss-free: integrals, floats, DateType
    * (epoch-day key) and TimestampType (epoch-micros key). Strings
    * are never here (truncation), decimals stay conservative.
    */
  private def boundValue(bd: BigDecimal, dt: DataType): Option[Any] =
    scala.util.Try[Any](dt match {
      case ByteType      => bd.toByteExact
      case ShortType     => bd.toShortExact
      case IntegerType   => bd.toIntExact
      case LongType      => bd.toLongExact
      case FloatType     => bd.toFloat
      case DoubleType    => bd.toDouble
      case DateType      => bd.toIntExact
      case TimestampType => bd.toLongExact
      case _             => throw new MatchError(dt)
    }).toOption

  /** The manifest answer for one output aggregate, or None → the
    * whole fold declines.
    */
  private def answer(ne: NamedExpression, answers: Answers,
                     chain: List[Project]): Option[Any] = ne match {
    case Alias(AggregateExpression(Count(Seq(Literal(v, _))), _, false, None, _), _)
        if v != null =>
      answers.count()
    case Alias(AggregateExpression(Min(e), _, false, None, _), _) =>
      for {
        attr <- resolveColumn(e, chain)
        (lo, _) <- answers.bounds(attr.name)
        v <- boundValue(lo, attr.dataType)
      } yield v
    case Alias(AggregateExpression(Max(e), _, false, None, _), _) =>
      for {
        attr <- resolveColumn(e, chain)
        (_, hi) <- answers.bounds(attr.name)
        v <- boundValue(hi, attr.dataType)
      } yield v
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(Seq(), exprs, child, _) if exprs.nonEmpty =>
      findTagged(child) match {
        case Some((answers, chain)) =>
          val vals = exprs.map(answer(_, answers, chain))
          if (vals.forall(_.isDefined))
            LocalRelation(agg.output,
              Seq(InternalRow.fromSeq(vals.map(_.get))))
          else agg
        case None => agg
      }
  }
}
