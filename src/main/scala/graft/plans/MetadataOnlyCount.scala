package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

import graft.sources.VersionedFileIndex

/** Catalyst optimizer rule: answer a global `COUNT(*)` / `MIN(col)` /
  * `MAX(col)` over a versioned-table scan FROM THE MANIFEST — Delta's
  * OptimizeMetadataOnlyQuery move. The manifest records every file's
  * exact row count and per-column min/max (footer metadata harvested
  * at commit time), so `SELECT count(*), min(k), max(k) FROM
  * graft_table(...)` collapses to a [[LocalRelation]] holding the
  * precomputed values: zero files opened, zero tasks launched, at ANY
  * table size. [[graft.sources.Versioned.metaCount]] /
  * `metaColRange` are the explicit API forms of the same arithmetic;
  * this rule gives them to plain SQL/DataFrame users.
  *
  * Soundness gates (all structural, all conservative):
  *  - GLOBAL aggregate (no grouping); every output is `count(literal)`
  *    (null-skipping `count(col)`, DISTINCT and FILTER clauses all
  *    disqualify) or `min`/`max` of a bare column reference;
  *  - the child is the bare scan reached only through row-preserving
  *    Project/SubqueryAlias nodes (Project renames are FOLLOWED so a
  *    column-mapped logical name resolves to its physical stats key;
  *    a Filter or Generate blocks the rewrite, as it must);
  *  - [[VersionedFileIndex.exactRowCount]] is None under a deletion
  *    vector — a DV can tombstone the extremal row, so min/max (and
  *    count) must scan (those plans also carry the anti-join above
  *    the relation, which already blocks the match — defense in
  *    depth);
  *  - min/max fold ONLY for int/long/double columns where EVERY file
  *    records the stat. Strings are excluded on purpose: parquet
  *    writers may TRUNCATE long binary statistics, so a string footer
  *    min/max is a bound, not necessarily a value present in the data
  *    — folding it could fabricate a result. Numeric footer stats are
  *    exact.
  */
case class MetadataOnlyCount(spark: SparkSession) extends Rule[LogicalPlan] {

  /** What one aggregate output needs from the manifest. */
  private sealed trait Need
  private case object RowCount extends Need
  private final case class ColExtreme(attr: Attribute, isMin: Boolean)
    extends Need

  private def needOf(e: Any): Option[Need] = e match {
    case Alias(AggregateExpression(Count(Seq(l: Literal)), Complete, false, None, _), _)
        if l.value != null => Some(RowCount)
    case Alias(AggregateExpression(Min(a: Attribute), Complete, false, None, _), _) =>
      Some(ColExtreme(a, isMin = true))
    case Alias(AggregateExpression(Max(a: Attribute), Complete, false, None, _), _) =>
      Some(ColExtreme(a, isMin = false))
    case _ => None
  }

  /** Walk to the bare scan, tracking the attribute renames Projects
    * apply, and return (index, logical→physical name map). */
  private def scanOf(p: LogicalPlan,
      attrs: Map[Long, Attribute]): Option[(VersionedFileIndex, Map[Long, String])] =
    p match {
      case Project(projectList, child) =>
        // follow each tracked attribute through this projection; a
        // tracked attr produced by anything but a bare (aliased)
        // reference cannot fold. The final names come from the
        // DEEPEST level — the relation's physical columns.
        val next = attrs.map { case (id, _) =>
          projectList.find(_.exprId.id == id) match {
            case Some(ar: AttributeReference) => Some(id -> (ar: Attribute))
            case Some(Alias(ar: AttributeReference, _)) => Some(id -> (ar: Attribute))
            case _ => None
          }
        }
        if (next.exists(_.isEmpty)) None
        else scanOf(child, next.flatten.toMap)
      case SubqueryAlias(_, child) => scanOf(child, attrs)
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation => fs.location match {
          case v: VersionedFileIndex =>
            Some((v, attrs.map { case (id, a) => id -> a.name }))
          case _ => None
        }
        case _ => None
      }
      case _ => None
    }

  private def foldValue(v: VersionedFileIndex, rows: Long, need: Need,
      phys: Map[Long, String]): Option[Any] = need match {
    case RowCount => Some(rows)
    case ColExtreme(attr, isMin) =>
      val name = phys.getOrElse(attr.exprId.id, attr.name)
      attr.dataType match {
        case LongType => v.statLongRange(name)
          .map(r => if (isMin) r._1 else r._2)
        case IntegerType => v.statLongRange(name)
          .map(r => (if (isMin) r._1 else r._2).toInt)
        case DoubleType => v.statDoubleRange(name)
          .map(r => if (isMin) r._1 else r._2)
        case _ => None // strings excluded: footer stats may be truncated
      }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case a @ Aggregate(grouping, aggs, child, _) if grouping.isEmpty &&
        aggs.nonEmpty && aggs.forall(needOf(_).isDefined) =>
      val needs = aggs.map(needOf(_).get)
      val tracked = needs.collect { case ColExtreme(attr, _) =>
        attr.exprId.id -> attr }.toMap
      (for {
        (idx, phys) <- scanOf(child, tracked)
        rows <- idx.exactRowCount
        values <- { // all-or-nothing: every output must fold
          val vs = needs.map(foldValue(idx, rows, _, phys))
          if (vs.forall(_.isDefined)) Some(vs.map(_.get)) else None
        }
      } yield LocalRelation(a.output.map(_.toAttribute),
        Seq(InternalRow.fromSeq(values)))).getOrElse(a)
  }
}
