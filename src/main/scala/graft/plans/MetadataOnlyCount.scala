package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.sources.VersionedFileIndex

/** Catalyst optimizer rule: answer a global `COUNT(*)` over a
  * versioned-table scan FROM THE MANIFEST — Delta's
  * OptimizeMetadataOnlyQuery move. The manifest already records every
  * file's exact row count (footer metadata harvested at commit time),
  * so `SELECT count(*) FROM graft_table(...)` collapses to a
  * [[LocalRelation]] holding the precomputed sum: zero files opened,
  * zero tasks launched, at ANY table size. [[graft.sources.Versioned.metaCount]]
  * is the explicit API form of the same arithmetic; this rule gives it
  * to plain SQL/DataFrame users who never see the manifest.
  *
  * Soundness gates (all must hold, each checked structurally):
  *  - the aggregate is GLOBAL (no grouping) and every output is a
  *    bare `count(literal)` — `count(col)` (null-skipping), DISTINCT,
  *    and FILTER clauses all disqualify;
  *  - the child is the bare scan, reached only through row-preserving
  *    nodes (Project/SubqueryAlias — 1:1 by construction; a Filter or
  *    Generate blocks the rewrite, as it must);
  *  - the scan's [[VersionedFileIndex]] vouches for exactness via
  *    `exactRowCount`, which is `None` whenever the snapshot carries a
  *    deletion vector (physical rows ≠ logical rows; those reads also
  *    never plan as a bare relation — the anti-join sits above — so
  *    this is defense in depth, not the primary guard).
  */
case class MetadataOnlyCount(spark: SparkSession) extends Rule[LogicalPlan] {

  private def countOnly(e: Any): Boolean = e match {
    case Alias(AggregateExpression(Count(Seq(l: Literal)), Complete, false, None, _), _)
        if l.value != null => true
    case _ => false
  }

  private def scanRows(p: LogicalPlan): Option[Long] = p match {
    case Project(_, child) => scanRows(child) // 1:1 — row count unchanged
    case SubqueryAlias(_, child) => scanRows(child)
    case l: LogicalRelation => l.relation match {
      case fs: HadoopFsRelation => fs.location match {
        case v: VersionedFileIndex => v.exactRowCount
        case _ => None
      }
      case _ => None
    }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case a @ Aggregate(grouping, aggs, child, _)
        if grouping.isEmpty && aggs.nonEmpty && aggs.forall(countOnly) =>
      scanRows(child) match {
        case Some(n) =>
          LocalRelation(a.output.map(_.toAttribute),
            Seq(InternalRow.fromSeq(Seq.fill(aggs.size)(n))))
        case None => a
      }
  }
}
