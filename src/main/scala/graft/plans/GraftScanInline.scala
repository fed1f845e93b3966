package graft.plans

import org.apache.spark.sql.{GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Command, CreateTableAsSelect, LogicalPlan, Project, ReplaceTableAsSelect, V2WriteCommand}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.sources.{GraftTable, VersionedScan}

/** Catalyst optimizer rule: replace a catalog read of a graft table
  * (the DSv2 relation [[graft.sources.GraftCatalog]] resolves
  * `SELECT ... FROM graft.t` to) with the NATIVE file-scan plan
  * [[VersionedScan.read]] builds — the Delta-style relation inline.
  *
  * Without this, catalog reads ride the V1 fallback bridge
  * ([[org.apache.spark.sql.connector.read.V1Scan]]), and Spark's
  * `V1ScanWrapper` hides the scan behind an opaque boundary the
  * optimizer cannot see through:
  *   - statistics vanish — the wrapper implements only `Scan`, so
  *     every graft table weighs in at `spark.sql.defaultSizeInBytes`
  *     (effectively infinite) and a join against one can NEVER
  *     statically broadcast, no matter how small the table. At
  *     warehouse scale that is the difference between a broadcast
  *     hash join and a full shuffle of the fact side.
  *   - [[MetadataOnlyCount]] cannot fire — `SELECT count(*)` scans
  *     instead of folding from the manifest.
  *   - runtime filters and whole-stage codegen stop at the wrapper.
  *
  * The inline splices the inner plan in directly, bridged by a
  * Project whose Aliases REUSE the relation's output exprIds, so
  * every upstream reference stays bound. Because this rule runs after
  * the optimizer's Finish Analysis batch, the spliced analyzed plan
  * would carry expressions no later batch rewrites: RuntimeReplaceable
  * (a stored non-literal column DEFAULT like `nvl(7, 5)` — unevaluable
  * at execution) and unfolded current_date()/current_timestamp(). The
  * rule therefore applies Spark's own `ReplaceExpressions` to each
  * splice and `ComputeCurrentTime` once per apply over the whole
  * rewritten tree — one instant shared by every spliced reference
  * (GraftScanInlineSpec pins both the nvl-default read and the
  * current_timestamp-default self-join). Everything downstream is
  * then the battle-tested native path: manifest min/max + bloom file
  * skipping, parquet row-group pushdown, exact `sizeInBytes` from the
  * manifest (auto-broadcast), deletion vectors and column mapping
  * (they are part of the inner plan), and metadata-only aggregates.
  *
  * Version resolution: the relation's [[GraftTable.readVersion]] was
  * pinned when the table was LOADED, and the analyzer's per-query
  * relation cache hands every reference to the same table the same
  * loaded instance — so outer scans, subqueries and self-join sides
  * all inline at ONE version even while commits race the planning.
  * The shared instance also carries the one-per-query manifest parse
  * ([[GraftTable.loadSnapshot]]), so multi-reference queries do no
  * redundant metadata I/O here.
  *
  * Deliberately NOT rewritten:
  *   - [[Command]] subtrees, EXCEPT the query side of write commands
  *     ([[V2WriteCommand]] children are the query alone — the target
  *     table is a field, not a child) and of CTAS/RTAS. Several
  *     command strategies pattern-match their target relation child
  *     (`DELETE FROM` → `SupportsDeleteV2`, `ALTER ... ADD CONSTRAINT
  *     ... CHECK` → the existing-data validation scan, `CACHE TABLE`
  *     → the cache key's analyzed shape); inlining under them breaks
  *     the match ("No plan for AddCheckConstraint"). The conservative
  *     rule — commands keep their plans verbatim, only genuine read
  *     queries inline — also future-proofs against new commands.
  *   - cached reads — cache substitution runs on the analyzed plan
  *     before optimization, so a cached graft.t is already an
  *     InMemoryRelation by the time this rule runs.
  *   - relations whose output the inner plan cannot supply by name
  *     under the session's resolver, including any case-ambiguous
  *     match (defensive: never break a query to optimize it).
  *
  * The catalog's own scan builder keeps filter/column pushdown for
  * sessions running the bare catalog WITHOUT GraftExtensions; this
  * rule upgrades extension-enabled sessions from "pruned V1 bridge"
  * to "no bridge at all". */
case class GraftScanInline(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val out = rewrite(plan)
    // fold current_date()/current_timestamp() that arrived INSIDE
    // spliced plans (stored defaults) with Spark's own rule, ONCE over
    // the whole rewritten tree — every spliced reference shares one
    // instant, matching the one-instant-per-query contract. (The
    // outer plan's own current_* were folded by the real Finish
    // Analysis batch before this rule ran; they are literals already.)
    if (out eq plan) plan
    else org.apache.spark.sql.catalyst.optimizer.ComputeCurrentTime(out)
  }

  private def rewrite(p: LogicalPlan): LogicalPlan = p match {
    case c: Command => c match {
      // write commands: children are the QUERY only (the target table
      // is a field) — safe and worthwhile to inline reads inside
      case w: V2WriteCommand => w.mapChildren(rewrite)
      case cta: CreateTableAsSelect => cta.mapChildren(rewrite)
      case rta: ReplaceTableAsSelect => rta.mapChildren(rewrite)
      // every other command (DELETE, constraint validation, CACHE,
      // ...) may pattern-match its relation child: leave verbatim
      case _ => c
    }
    case r: DataSourceV2Relation => inline(r, r.table)
    case other =>
      val mapped = other.mapChildren(rewrite)
      mapped.transformExpressionsDown {
        case se: SubqueryExpression => se.withNewPlan(rewrite(se.plan))
      }
  }

  private def inline(rel: LogicalPlan,
      table: org.apache.spark.sql.connector.catalog.Table): LogicalPlan =
    table match {
      case g: GraftTable if g.readVersion > 0 =>
        // loadSnapshot is the loaded instance's one-per-query manifest
        // parse — shared with schema resolution and, via the relation
        // cache, with every other reference to this table in the plan.
        // The splice is the ANALYZED inner plan with RuntimeReplaceable
        // expressions rewritten (stored defaults like nvl() — this rule
        // runs after the Finish Analysis batch, so nothing downstream
        // would rewrite them and they are unevaluable as-is); current_*
        // folding happens once per apply, above, so references share
        // one instant — a per-reference inner optimization would fold
        // a DIFFERENT instant into each scan of the same table.
        // ReplaceCurrentLike covers the OTHER Finish-Analysis family a
        // stored default can smuggle in: current_user() /
        // current_database() / current_catalog() are unevaluable
        // placeholder expressions until that rule folds them, and
        // nothing downstream of this rule would (the V1 bridge
        // re-optimized from scratch and so handled them by accident)
        val inner = org.apache.spark.sql.catalyst.optimizer
          .ReplaceCurrentLike(spark.sessionState.catalogManager)(
            org.apache.spark.sql.catalyst.optimizer
              .ReplaceExpressions(GraftShims.logicalPlan(
                VersionedScan.read(spark, g.location, g.loadSnapshot))))
        // name-bridge under the session's resolver; any ambiguity
        // (case-duplicate columns under caseInsensitive) bails out
        val caseSensitive = spark.sessionState.conf.caseSensitiveAnalysis
        def key(n: String): String =
          if (caseSensitive) n else n.toLowerCase(java.util.Locale.ROOT)
        val grouped = inner.output.groupBy(a => key(a.name))
        if (grouped.valuesIterator.exists(_.size > 1)) rel
        else {
          val byName = grouped.map { case (k, as) => k -> as.head }
          val bridged = rel.output.map { a =>
            byName.get(key(a.name)).map(src =>
              Alias(src, a.name)(exprId = a.exprId))
          }
          if (bridged.exists(_.isEmpty)) rel // unmappable column: leave as-is
          else Project(bridged.flatten, inner)
        }
      // readVersion <= 0 = no visible commit yet (racing create):
      // leave the bridge to surface the usual no-commits error
      case _ => rel
    }
}
