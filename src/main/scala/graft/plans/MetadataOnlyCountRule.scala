package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

import graft.sources.GraftRelation

/** Optimizer rule: a global `count(*)` over an UNFILTERED graft
  * snapshot read answers from the manifest instead of scanning —
  * Delta's metadata-only query optimization
  * (`OptimizeMetadataOnlyQuery` / numRecords), re-expressed as a
  * Catalyst `Rule[LogicalPlan]` injected through
  * [[graft.GraftExtensions]]. `spark.read.format("graft").load(dir)
  * .count()` on a 100 TB table becomes one `LocalRelation` row built
  * from Σ per-file row stamps − Σ deletion-vector positions: zero
  * tasks, zero bytes of data I/O.
  *
  * The rewrite fires ONLY when it is provably the same answer:
  *  - the aggregate is global (no grouping) and every output is a
  *    non-distinct, unfiltered `count(<non-null literal>)` — the
  *    `count(*)` / `count(1)` family; `count(col)` is null-sensitive
  *    and never rewrites;
  *  - the child is the graft relation under Project nodes only —
  *    projections cannot change cardinality, anything else (Filter,
  *    Join, Generate, limits) stops the match;
  *  - every file in the relation's pinned manifest carries a row
  *    stamp ([[GraftRelation.metaRowCount]] is Some) — unknown is
  *    never zero, pre-stamp and adopted tables keep scanning.
  *
  * The replacement [[LocalRelation]] reuses the Aggregate's own output
  * attributes, so downstream references resolve unchanged. Time
  * travel is free: the relation pins its version's manifest, so a
  * `VERSION AS OF` count answers from that version's stamps. */
case class MetadataOnlyCountRule(session: SparkSession)
    extends Rule[LogicalPlan] {

  /** A non-distinct, unfiltered count of a non-null literal — the
    * shapes whose value is exactly the child's row count. */
  private def isCountStar(e: NamedExpression): Boolean = e match {
    case Alias(ae: AggregateExpression, _) =>
      ae.mode == Complete && !ae.isDistinct && ae.filter.isEmpty &&
        (ae.aggregateFunction match {
          case Count(Seq(Literal(v, _))) => v != null
          case _ => false
        })
    case _ => false
  }

  /** The metadata count of the subtree, when it is a graft relation
    * under cardinality-preserving Project nodes only. */
  private def metaCountOf(plan: LogicalPlan): Option[Long] = plan match {
    case Project(_, child) => metaCountOf(child)
    case lr: LogicalRelation => lr.relation match {
      case g: GraftRelation => g.metaRowCount
      case _ => None
    }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(Nil, exprs, child, _)
        if exprs.nonEmpty && exprs.forall(isCountStar) =>
      metaCountOf(child) match {
        case Some(n) =>
          LocalRelation(agg.output,
            Seq(InternalRow.fromSeq(Seq.fill(exprs.size)(n))))
        case None => agg
      }
  }
}
