package graft.plans

import org.apache.spark.sql.{GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Command, CreateTableAsSelect, LogicalPlan, Project, ReplaceTableAsSelect, V2WriteCommand}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}

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
  *   - statistics vanish — the wrapper does not forward
  *     `SupportsReportStatistics`, so every graft table weighs in at
  *     `spark.sql.defaultSizeInBytes` (effectively infinite) and a
  *     join against one can NEVER statically broadcast, no matter how
  *     small the table. At warehouse scale that is the difference
  *     between a broadcast hash join and a full shuffle of the fact
  *     side.
  *   - [[MetadataOnlyCount]] cannot fire — `SELECT count(*)` scans
  *     instead of folding from the manifest.
  *   - runtime filters and whole-stage codegen stop at the wrapper.
  *
  * The inline splices the inner plan in directly, bridged by a
  * Project whose Aliases REUSE the relation's output exprIds, so
  * every upstream reference stays bound. Everything downstream is
  * then the battle-tested native path: manifest min/max + bloom file
  * skipping, parquet row-group pushdown, exact `sizeInBytes` from the
  * manifest (auto-broadcast), deletion vectors and column mapping
  * (they are part of the inner plan), and metadata-only aggregates.
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
  *     (defensive: never break a query to optimize it).
  *
  * The catalog's own scan builder keeps filter/column pushdown for
  * sessions running the bare catalog WITHOUT GraftExtensions; this
  * rule upgrades extension-enabled sessions from "pruned V1 bridge"
  * to "no bridge at all" — and adds intra-query snapshot isolation:
  * all latest-version reads of one table inside one query inline at
  * ONE resolved version (see apply), where the V1 bridge resolves
  * each scan's latest independently at physical planning. */
case class GraftScanInline(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // QUERY-LEVEL SNAPSHOT PIN: every latest-version relation of the
    // same table inlines at ONE version, resolved once per apply —
    // without this, a self-join's two scans each resolve latest
    // independently and a commit landing between the two resolutions
    // splits the query across versions (a torn read the V1 fallback
    // path has always had, since each toV1TableScan resolved its own
    // latest at physical planning). The memo is per-invocation: the
    // first apply inlines everything (no V2 relations survive), so a
    // plan never mixes memos, and the NEXT query re-resolves fresh —
    // latest-at-planning semantics (stream-static reads still refresh
    // per micro-batch) with intra-query snapshot isolation.
    val latestByPath = scala.collection.mutable.Map.empty[String, Long]
    rewrite(plan, latestByPath)
  }

  private def rewrite(p: LogicalPlan,
      pins: scala.collection.mutable.Map[String, Long]): LogicalPlan = p match {
    case c: Command => c match {
      // write commands: children are the QUERY only (the target table
      // is a field) — safe and worthwhile to inline reads inside
      case w: V2WriteCommand => w.mapChildren(rewrite(_, pins))
      case cta: CreateTableAsSelect => cta.mapChildren(rewrite(_, pins))
      case rta: ReplaceTableAsSelect => rta.mapChildren(rewrite(_, pins))
      // every other command (DELETE, constraint validation, CACHE,
      // ...) may pattern-match its relation child: leave verbatim
      case _ => c
    }
    case r: DataSourceV2Relation => inline(r, r.table, pins)
    case s: DataSourceV2ScanRelation => inline(s, s.relation.table, pins)
    case other =>
      val mapped = other.mapChildren(rewrite(_, pins))
      mapped.transformExpressionsDown {
        case se: SubqueryExpression => se.withNewPlan(rewrite(se.plan, pins))
      }
  }

  private def inline(rel: LogicalPlan,
      table: org.apache.spark.sql.connector.catalog.Table,
      pins: scala.collection.mutable.Map[String, Long]): LogicalPlan =
    table match {
      case g: GraftTable =>
        val v =
          if (g.pinnedVersion > 0) g.pinnedVersion
          else pins.getOrElseUpdate(g.location,
            graft.sources.Versioned.latestVersion(spark, g.location))
        // a catalog table always has >= 1 commit (CREATE mints v1);
        // 0 = a racing create's half-visible table — leave it to the
        // fallback path rather than fail the whole optimization
        if (v <= 0) return rel
        val inner = GraftShims.logicalPlan(
          VersionedScan.read(spark, g.location, v))
        val byName = inner.output.map(a => a.name.toLowerCase -> a).toMap
        val bridged = rel.output.map { a =>
          byName.get(a.name.toLowerCase).map(src =>
            Alias(src, a.name)(exprId = a.exprId))
        }
        if (bridged.exists(_.isEmpty)) rel // unmappable column: leave as-is
        else Project(bridged.flatten, inner)
      case _ => rel
    }
}
