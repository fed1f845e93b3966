package graft.sources

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession, SQLContext}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, Contains, EndsWith, EqualNullSafe, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal, Not, Or, StartsWith}
import org.apache.spark.sql.connector.catalog.{Column, Identifier, SupportsDeleteV2, SupportsRead, SupportsWrite, Table, TableCapability, TableCatalog, TableCatalogCapability, TableChange, TableInfo}
import org.apache.spark.sql.connector.catalog.constraints.{Check, Constraint}
import org.apache.spark.sql.connector.expressions.{GeneralScalarExpression, NamedReference, Transform, Expression => V2Expression, Literal => V2Literal}
import org.apache.spark.sql.connector.expressions.filter.{Predicate => V2Predicate}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.{BaseRelation, InsertableRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 CATALOG over versioned tables — the pure-SQL door to
  * the whole table lifecycle, no graft imports, no TVFs:
  *
  * {{{
  * spark.sql.catalog.graft           = graft.sources.GraftCatalog
  * spark.sql.catalog.graft.warehouse = /data/graft
  *
  * CREATE TABLE graft.events (k BIGINT, v STRING)
  *   TBLPROPERTIES ('key' = 'k')                -- commit-key layout
  * INSERT INTO graft.events SELECT ...          -- append commit
  * INSERT OVERWRITE graft.events SELECT ...     -- overwrite commit
  * SELECT * FROM graft.events VERSION AS OF 3   -- time travel
  * SELECT * FROM graft.events TIMESTAMP AS OF '...'
  * DROP TABLE graft.events
  * }}}
  *
  * An identifier maps to `warehouse/namespace.../name` — a plain
  * versioned table root, interchangeable with every library-API and
  * `format("graft")` path (the catalog adds addressing, not a new
  * format). Reads and writes ride the V1 FALLBACK bridge
  * ([[V1Scan]]/[[V1Write]] — the JDBC connector's pattern): the scan
  * hands Spark the SAME manifest-pruned relation the TVF door uses,
  * and a write lands as one [[Versioned.appendCommit]]/commit, so
  * CHECK constraints, generated columns, identity, row tracking and
  * conflict detection all apply unchanged. `TBLPROPERTIES('key')`
  * pins the commit key at create; appends inherit it from the prior
  * snapshot. ALTER goes through the library's schema-evolution API by
  * design (column mapping, widening and defaults are metadata COMMITS
  * with their own conflict semantics — not catalog metadata edits).
  */
class GraftCatalog extends TableCatalog
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog {

  /** `CALL graft.system.<proc>(...)` — SQL maintenance procedures
    * (optimize / vacuum / restore / recluster); see
    * [[GraftProcedures]]. */
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    GraftProcedures.load(this, ident)

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.toSeq == Seq("system"))
      GraftProcedures.names.map(n => Identifier.of(namespace, n)).toArray
    else Array.empty
  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"spark.sql.catalog.$name.warehouse must point at a directory"))
  }

  override def name(): String = catalogName

  private def spark = SparkSession.active

  private[sources] def pathOf(ident: Identifier): String =
    (warehouse +: (ident.namespace().toSeq :+ ident.name())).mkString("/")

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = new Path((warehouse +: namespace.toSeq).mkString("/"))
    val f = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(dir)) Array.empty
    else f.listStatus(dir).filter(_.isDirectory).map(_.getPath)
      .filter(p => f.exists(new Path(p, "_versions")))
      .map(p => Identifier.of(namespace, p.getName))
  }

  override def tableExists(ident: Identifier): Boolean =
    Versioned.latestVersion(spark, pathOf(ident)) > 0

  /** Metadata relations addressable as `<table>.<meta>` (Iceberg's
    * metadata-table naming): `SELECT * FROM graft.t.files` etc. A real
    * table always wins the name; the meta suffix only resolves when
    * the PARENT is a table. */
  private val metaTables: Map[String, (SparkSession, String) => DataFrame] =
    Map(
      "files" -> ((s, p) => Versioned.filesTable(s, p)),
      "history" -> ((s, p) => Versioned.history(s, p)),
      "branches" -> ((s, p) => {
        val sp = s; import sp.implicits._
        Branches.list(s, p).toDF("branch", "fork_version", "head_version")
      }),
      "tags" -> ((s, p) => {
        val sp = s; import sp.implicits._
        Branches.tags(s, p).toDF("tag", "version")
      }),
      "detail" -> ((s, p) => {
        val sp = s; import sp.implicits._
        val snap = Versioned.snapshot(s, p)
        Seq((snap.version, snap.files.size.toLong,
          snap.files.map(_.bytes).sum, snap.files.map(_.rows).sum,
          snap.statsCol.orNull, snap.constraints.size,
          snap.generated.size, snap.identity.map(_._1).orNull,
          snap.dv.isDefined, snap.mapping.isDefined))
          .toDF("version", "num_files", "size_bytes", "physical_rows",
            "cluster_key", "num_constraints", "num_generated",
            "identity_column", "has_deletion_vector", "has_column_mapping")
      }))

  override def loadTable(ident: Identifier): Table = {
    // resolve latest ONCE here — it is both the existence check and
    // the loaded table's read pin (a second listStatus per load would
    // double the object-store round-trips on every statement)
    val p = pathOf(ident)
    val latest = Versioned.latestVersion(spark, p)
    if (latest > 0)
      return new GraftTable(p, ident.toString, -1L, knownLatest = latest)
    if (ident.namespace().nonEmpty && metaTables.contains(ident.name())) {
      val parent = Identifier.of(ident.namespace().dropRight(1),
        ident.namespace().last)
      if (tableExists(parent)) {
        val p = pathOf(parent)
        val gen = metaTables(ident.name())
        return new GraftMetaTable(ident.toString, () => gen(spark, p))
      }
    }
    throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
      ident.namespace().toSeq :+ ident.name())
  }

  /** `VERSION AS OF n` — the DSv2 time-travel hook. */
  override def loadTable(ident: Identifier, version: String): Table =
    new GraftTable(pathOf(ident), ident.toString, version.toLong)

  /** `TIMESTAMP AS OF ts` — micros per the DSv2 contract, resolved
    * through the monotonized commit-timestamp walk. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val p = pathOf(ident)
    new GraftTable(p, ident.toString,
      Versioned.snapshotAsOf(spark, p, timestampMicros / 1000L).version)
  }

  /** CREATE TABLE with declarative TBLPROPERTIES riding the library's
    * DDL commits — each property lands its own versioned, validated
    * commit right after the CREATE:
    *
    * {{{
    * CREATE TABLE graft.t (k BIGINT, cents BIGINT) TBLPROPERTIES (
    *   'key' = 'k',                      -- clustered commit-key layout
    *   'check.cents_nonneg' = 'cents >= 0',  -- CHECK constraint
    *   'generated.flag' = 'cents > 100', -- generated column
    *   'identity' = 'rid')               -- GENERATED ALWAYS AS IDENTITY
    * }}}
    *
    * Properties apply in DEPENDENCY order (generated → identity →
    * checks), and a failing property drops the half-created table so
    * the failed statement leaves nothing. A CHECK may not reference a
    * generated or identity column at CREATE time — those columns have
    * no physical presence until the first write; add such a constraint
    * after data lands (Versioned.addCheckConstraint).
    */
  /** What the SQL DDL surface may hand this catalog beyond plain
    * columns: CHECK table constraints, column DEFAULTs, and
    * GENERATED ALWAYS AS (expr) / AS IDENTITY columns — each mapped
    * onto the library's existing declarative commits (the same ones
    * the TBLPROPERTIES spellings drive). */
  override def capabilities(): util.Set[TableCatalogCapability] =
    util.EnumSet.of(
      TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE,
      TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT,
      TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS,
      TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_IDENTITY_COLUMNS)

  /** Standard-SQL column/constraint clauses route through here
    * (`CREATE TABLE t (v BIGINT DEFAULT 5, rid BIGINT GENERATED
    * ALWAYS AS IDENTITY, band STRING GENERATED ALWAYS AS (...),
    * CONSTRAINT c CHECK (...))`) — same declarative commits as the
    * TBLPROPERTIES spellings, so the two surfaces stay
    * interchangeable. */
  override def createTable(ident: Identifier, info: TableInfo): Table =
    createTableFull(ident, info.columns(), info.partitions(),
      info.properties(), info.constraints())

  override def createTable(ident: Identifier, columns: Array[Column],
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table =
    createTableFull(ident, columns, partitions, properties, Array.empty)

  private def createTableFull(ident: Identifier, columns: Array[Column],
      partitions: Array[Transform],
      properties: util.Map[String, String],
      tableConstraints: Array[Constraint]): Table = {
    require(partitions.isEmpty,
      "graft tables take no PARTITIONED BY — set TBLPROPERTIES('key') " +
        "for clustered layout (range-partitioned, stats-pruned files)")
    val p = pathOf(ident)
    require(Versioned.latestVersion(spark, p) == 0,
      s"table $ident already exists")
    // captured BEFORE the first commit: governs how far a failing
    // TBLPROPERTIES application below may unwind
    val pathPreExisted = {
      val hp = new Path(p)
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(hp)
    }
    // VALIDATE the declarative clauses BEFORE the first commit — a
    // refused CREATE must leave nothing, not a half-created table
    val (identityCols, rest0) =
      columns.partition(_.identityColumnSpec() != null)
    val (genCols, plainCols) =
      rest0.partition(_.generationExpression() != null)
    require(identityCols.length <= 1,
      "graft tables take at most one IDENTITY column")
    identityCols.foreach { c =>
      val spec = c.identityColumnSpec()
      require(spec.getStep == 1L,
        s"IDENTITY column ${c.name()}: graft allocates dense +1 ids; " +
          s"STEP ${spec.getStep} is not supported")
      require(!spec.isAllowExplicitInsert,
        s"IDENTITY column ${c.name()}: only GENERATED ALWAYS is " +
          "supported (BY DEFAULT would bypass the allocator)")
    }
    tableConstraints.foreach {
      case _: Check => ()
      case other => throw new UnsupportedOperationException(
        s"graft supports CHECK table constraints; got ${other.toDDL}")
    }
    // generated / identity columns have no physical presence until the
    // first write — the CREATE schema carries only the plain columns,
    // exactly like the TBLPROPERTIES spelling
    val schema = StructType(plainCols.map(c =>
      org.apache.spark.sql.types.StructField(c.name(), c.dataType(),
        c.nullable())))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    Versioned.commit(spark, p, empty,
      Option(properties.get("key")), files = 1, op = "CREATE")
    import scala.jdk.CollectionConverters._
    // DEPENDENCY order, not alphabetical: generated/identity
    // declarations before checks (note a CHECK still cannot reference
    // a generated column at CREATE — see the docstring; the ordering
    // matters so the failure MODE is the constraint's clear
    // absent-column error, not an order-dependent one). A failing
    // property unwinds ONLY what this CREATE wrote: the _versions log
    // always; the whole directory only if the path did not pre-exist
    // (a pre-existing plain-parquet dir — the convert-in-place layout
    // — must never lose user data to a failed CREATE).
    val props = properties.asScala.toSeq.sortBy(_._1)
    try {
      genCols.foreach(c =>
        Versioned.addGeneratedColumn(spark, p, c.name(),
          c.generationExpression()))
      props.foreach {
        case (k, v) if k.startsWith("generated.") =>
          Versioned.addGeneratedColumn(spark, p, k.stripPrefix("generated."), v)
        case _ => ()
      }
      identityCols.foreach(c =>
        Versioned.setIdentity(spark, p, c.name(),
          c.identityColumnSpec().getStart))
      props.foreach {
        case ("identity", c) => Versioned.setIdentity(spark, p, c)
        case _ => ()
      }
      plainCols.filter(_.defaultValue() != null).foreach(c =>
        Versioned.setColumnDefault(spark, p, c.name(),
          Some(c.defaultValue().getSql)))
      props.foreach {
        case (k, v) if k.startsWith("check.") =>
          Versioned.addCheckConstraint(spark, p, k.stripPrefix("check."), v)
        case _ => ()
      }
      tableConstraints.foreach { case c: Check =>
        Versioned.addCheckConstraint(spark, p, c.name(), c.predicateSql())
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        try {
          val hp = new Path(p)
          val f = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
          if (pathPreExisted) f.delete(new Path(hp, "_versions"), true)
          else f.delete(hp, true)
        } catch { case scala.util.control.NonFatal(_) => () } // keep cause
        throw e
    }
    new GraftTable(p, ident.toString, -1L)
  }

  /** ALTER TABLE delegates to the library's schema-evolution COMMITS —
    * each change is a versioned, conflict-checked manifest publication
    * (column mapping, widening, initial defaults), never a catalog
    * metadata edit:
    *
    * {{{
    * ALTER TABLE graft.t ADD COLUMN c BIGINT          -- Versioned.addColumn
    * ALTER TABLE graft.t RENAME COLUMN a TO b         -- Versioned.renameColumn
    * ALTER TABLE graft.t DROP COLUMN c                -- Versioned.dropColumn
    * ALTER TABLE graft.t ALTER COLUMN c TYPE BIGINT   -- Versioned.widenColumn
    * }}}
    *
    * All four are METADATA-ONLY at any table size (zero data I/O:
    * mapping indirection for rename/drop, read-time upcast for widen,
    * noCols stamps for add) and land one commit per change in
    * statement order. Unsupported shapes (nested fields, positions,
    * narrowing, comment/nullability edits) are refused eagerly —
    * nothing partial publishes before the refusal because validation
    * happens per change right before its commit, and each committed
    * change is a complete, consistent version on its own. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val p = pathOf(ident)
    changes.foreach {
      case a: TableChange.AddColumn =>
        require(a.fieldNames.length == 1,
          s"graft ALTER ADD supports top-level columns; got ${a.fieldNames.mkString(".")}")
        require(a.position() == null,
          "graft ALTER ADD ignores column position; omit FIRST/AFTER")
        // `ADD COLUMN c T DEFAULT e` carries its default as the
        // INITIAL default too (pre-add rows read e via noCols stamps)
        Versioned.addColumn(spark, p, a.fieldNames.head, a.dataType().sql,
          Option(a.defaultValue()).map(_.getSql))
      case ac: TableChange.AddConstraint => ac.constraint() match {
        case c: Check =>
          // validates the EXISTING data before the metadata commit —
          // a violated ADD CONSTRAINT publishes nothing
          Versioned.addCheckConstraint(spark, p, c.name(), c.predicateSql())
        case other => throw new UnsupportedOperationException(
          s"graft supports CHECK constraints; got ${other.toDDL}")
      }
      case dc: TableChange.DropConstraint =>
        // resolve the STORED name case-insensitively: the existence
        // probe and the drop must use the same case rule, or IF EXISTS
        // throws on a case-mismatched name instead of dropping
        Versioned.snapshot(spark, p).constraints
          .find(_._1.equalsIgnoreCase(dc.name())) match {
          case Some((stored, _)) =>
            Versioned.dropCheckConstraint(spark, p, stored)
          case None if dc.ifExists() => ()
          case None =>
            // let the library's clear no-such-constraint error surface
            Versioned.dropCheckConstraint(spark, p, dc.name())
        }
      case ud: TableChange.UpdateColumnDefaultValue =>
        require(ud.fieldNames.length == 1,
          s"graft SET DEFAULT supports top-level columns; got ${ud.fieldNames.mkString(".")}")
        // SET DEFAULT carries the expression; DROP DEFAULT arrives as
        // an empty/null new default -> clear the entry
        Versioned.setColumnDefault(spark, p, ud.fieldNames.head,
          Option(ud.newCurrentDefault()).map(_.getSql).filter(_.nonEmpty))
      case r: TableChange.RenameColumn =>
        require(r.fieldNames.length == 1,
          s"graft ALTER RENAME supports top-level columns; got ${r.fieldNames.mkString(".")}")
        Versioned.renameColumn(spark, p, r.fieldNames.head, r.newName())
      case d: TableChange.DeleteColumn =>
        require(d.fieldNames.length == 1,
          s"graft ALTER DROP supports top-level columns; got ${d.fieldNames.mkString(".")}")
        Versioned.dropColumn(spark, p, d.fieldNames.head)
      case u: TableChange.UpdateColumnType =>
        require(u.fieldNames.length == 1,
          s"graft ALTER TYPE supports top-level columns; got ${u.fieldNames.mkString(".")}")
        val name = u.fieldNames.head
        // validate BEFORE committing: a refused narrowing must not
        // publish the (idempotent) widen version as a side effect
        import org.apache.spark.sql.types.{DoubleType, FloatType, IntegerType, LongType}
        val snap = Versioned.snapshot(spark, p)
        val cur = snap.physicalSchema.map(
          _(snap.physicalName(name)).dataType)
        val req = u.newDataType()
        // NOTE: MERGE WITH SCHEMA EVOLUTION never routes type changes
        // here — Spark 4.1 refuses any non-AddColumn change in auto
        // evolution (UNSUPPORTED_TABLE_CHANGES_IN_AUTO_SCHEMA_EVOLUTION)
        // before calling alterTable, so a differently-typed source
        // column fails loudly at the analyzer. This branch serves
        // explicit ALTER (analyzer-guarded) and direct API use.
        val isWidening = (cur, req) match {
          case (Some(IntegerType), LongType) => true
          case (Some(FloatType), DoubleType) => true
          case _ => false
        }
        require(isWidening,
          s"ALTER COLUMN $name TYPE ${req.sql}: graft only " +
            s"widens int->bigint and float->double (column is " +
            s"${cur.map(_.sql).getOrElse("unknown")})")
        Versioned.widenColumn(spark, p, name)
      case other => throw new UnsupportedOperationException(
        s"graft ALTER does not support ${other.getClass.getSimpleName}; " +
          "supported: ADD COLUMN, RENAME COLUMN, DROP COLUMN, " +
          "ALTER COLUMN ... TYPE (widening)")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val p = new Path(pathOf(ident))
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.exists(p) && f.delete(p, true)
  }

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    val f = new Path(warehouse)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(f.rename(new Path(pathOf(from)), new Path(pathOf(to))),
      s"rename $from -> $to failed")
  }
}

/** V2→Catalyst predicate translation for the SQL DELETE door: Spark
  * pushes `DELETE FROM`'s condition as DSv2 [[V2Predicate]]s; each
  * translatable predicate becomes the EXACT Catalyst expression
  * [[Versioned.deleteWhereExpr]] then both prunes files with and
  * filters rewritten rows by — one predicate, two consumers, no
  * semantic gap. Untranslatable nodes return None and the table's
  * `canDeleteWhere` refuses, so Spark raises a clean error instead of
  * a wrong partial delete. */
private[sources] object V2PredicateTranslator {
  def toCatalyst(e: V2Expression): Option[Expression] = e match {
    case f: NamedReference =>
      // field parts arrive pre-parsed; nested paths are refused by the
      // single-part check (graft stats and mapping are top-level)
      if (f.fieldNames().length == 1)
        Some(UnresolvedAttribute(f.fieldNames().head))
      else None
    case l: V2Literal[_] => Some(Literal(l.value, l.dataType))
    case p: V2Predicate =>
      def kids: Option[Seq[Expression]] = {
        val ts = p.children().toSeq.map(toCatalyst)
        if (ts.forall(_.isDefined)) Some(ts.map(_.get)) else None
      }
      def bin(f: (Expression, Expression) => Expression) =
        kids.collect { case Seq(a, b) => f(a, b) }
      p.name() match {
        case "ALWAYS_TRUE" => Some(Literal.TrueLiteral)
        case "ALWAYS_FALSE" => Some(Literal.FalseLiteral)
        case "=" => bin(EqualTo)
        case "<=>" => bin(EqualNullSafe)
        case "<>" => bin((a, b) => Not(EqualTo(a, b)))
        case "<" => bin(LessThan)
        case "<=" => bin(LessThanOrEqual)
        case ">" => bin(GreaterThan)
        case ">=" => bin(GreaterThanOrEqual)
        case "AND" => bin(And)
        case "OR" => bin(Or)
        case "NOT" => kids.collect { case Seq(a) => Not(a) }
        case "IS_NULL" => kids.collect { case Seq(a) => IsNull(a) }
        case "IS_NOT_NULL" => kids.collect { case Seq(a) => IsNotNull(a) }
        case "IN" => kids.collect { case s if s.size >= 2 =>
          In(s.head, s.tail) }
        case "STARTS_WITH" => bin(StartsWith)
        case "ENDS_WITH" => bin(EndsWith)
        case "CONTAINS" => bin(Contains)
        case _ => None
      }
    case g: GeneralScalarExpression =>
      import org.apache.spark.sql.catalyst.expressions.{Add, Divide, Multiply, Remainder, Subtract, UnaryMinus}
      def kids: Option[Seq[Expression]] = {
        val ts = g.children().toSeq.map(toCatalyst)
        if (ts.forall(_.isDefined)) Some(ts.map(_.get)) else None
      }
      def bin(f: (Expression, Expression) => Expression) =
        kids.collect { case Seq(a, b) => f(a, b) }
      g.name() match {
        case "+" => bin(Add(_, _))
        case "-" => kids.collect {
          case Seq(a, b) => Subtract(a, b)
          case Seq(a) => UnaryMinus(a)
        }
        case "*" => bin(Multiply(_, _))
        case "/" => bin(Divide(_, _))
        case "%" => bin(Remainder(_, _))
        case _ => None
      }
    case _ => None
  }
}

/** Read-only metadata relation behind the `<table>.<meta>` naming
  * (files / history / branches / tags) — zero data I/O: each is
  * O(manifest) driver metadata rendered as rows, scanned through the
  * same V1 bridge as the table itself. */
final class GraftMetaTable(ident: String, gen: () => DataFrame)
    extends Table with SupportsRead {
  // ONE generator evaluation per loadTable (analysis calls schema()
  // repeatedly, and the scan needs the same rows) — each statement
  // resolves a fresh GraftMetaTable, so the snapshot is still pinned
  // per statement, not stale across them
  private lazy val data: DataFrame = gen()
  override def name(): String = ident
  override def schema(): StructType = data.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new V1Scan {
        override def readSchema(): StructType = GraftMetaTable.this.schema()
        override def toV1TableScan[T <: BaseRelation with TableScan](
            context: SQLContext): T =
          new GraftFrameRelation(context.sparkSession, data)
            .asInstanceOf[T]
      }
    }
}

/** One versioned table behind the DSv2 [[Table]] interface, pinned at
  * `version` (-1 = latest-at-read; reads then pin [[readVersion]] at
  * load). `knownLatest` lets the catalog pass the latest version its
  * existence check already resolved, avoiding a second listStatus. */
final class GraftTable(path: String, ident: String, version: Long,
    knownLatest: Long = -1L)
    extends Table with SupportsRead with SupportsWrite
    with SupportsDeleteV2 {

  /** Table root on disk — what the SQL DML rewrite
    * ([[graft.plans.GraftDmlRewrite]]) hands the Versioned commit
    * paths. */
  private[graft] def location: String = path

  /** The version READS of this loaded table resolve to: the user's
    * time-travel pin when given, else the latest version AT LOAD TIME
    * (-1 only for a table with no visible commit yet — a racing
    * create; such reads stay dynamic and fail with the usual
    * no-commits error if executed). Resolving once here, rather than
    * per scan at planning, is what makes one query read ONE snapshot:
    * the analyzer's per-query relation cache hands every reference to
    * the same table — outer scans, subqueries, self-join sides — this
    * same instance (pinned in GraftScanInlineSpec), so a commit racing
    * the planning can never split a query across versions. WRITE
    * paths deliberately keep consulting `version` (the user pin) and
    * re-resolve latest at execution: appends target the CAS head, and
    * only an explicit `VERSION AS OF` refuses writes. */
  private[graft] val readVersion: Long =
    if (version > 0) version
    else {
      val v =
        if (knownLatest > 0) knownLatest
        else Versioned.latestVersion(SparkSession.active, path)
      if (v > 0) v else -1L
    }

  /** `DELETE FROM graft.t WHERE ...`: translatable iff every pushed
    * predicate maps to the Catalyst algebra the copy-on-write delete
    * understands. The delete itself is [[Versioned.deleteWhereExpr]] —
    * stats-pruned file classification, DV-aware rewrite, CAS commit. */
  override def canDeleteWhere(predicates: Array[V2Predicate]): Boolean =
    version <= 0 &&
      predicates.forall(p => V2PredicateTranslator.toCatalyst(p).isDefined)

  override def deleteWhere(predicates: Array[V2Predicate]): Unit = {
    require(version <= 0,
      s"cannot delete from $ident pinned at VERSION AS OF $version")
    val conj = predicates.toSeq
      .map(p => V2PredicateTranslator.toCatalyst(p).getOrElse(
        throw new UnsupportedOperationException(
          s"DELETE predicate not supported by graft: $p")))
      .reduceOption(And).getOrElse(Literal.TrueLiteral)
    Versioned.deleteWhereExpr(spark, path, conj)
  }

  private def spark = SparkSession.active

  override def name(): String = ident

  // per-INSTANCE caches: a loaded Table represents one snapshot, and
  // Spark calls schema()/columns() repeatedly during a single query's
  // analysis — without the cache each call re-lists the version dir,
  // re-parses the manifest and rebuilds the scan's file index (driver
  // metadata I/O multiplied per query). A fresh loadTable returns a
  // fresh instance, so cross-statement staleness is unaffected.
  /** The manifest of the load-pinned version, parsed ONCE per loaded
    * instance — the relation cache shares the instance query-wide, so
    * schema resolution, the scan inline and the V1 bridge all reuse
    * one parse. Only valid for a pinned read (readVersion > 0). */
  private[graft] lazy val loadSnapshot: Versioned.Snapshot = {
    require(readVersion > 0, s"$ident has no commits to snapshot")
    Versioned.snapshot(spark, path, readVersion)
  }

  private lazy val cachedSchema: StructType =
    if (readVersion > 0) VersionedScan.read(spark, path, loadSnapshot).schema
    else VersionedScan.read(spark, path, -1L).schema

  override def schema(): StructType = cachedSchema

  /** Declared column DEFAULTs surface through the V2 column metadata —
    * that is what makes Spark's own insert resolution substitute them
    * for omitted column-list INSERTs and the DEFAULT keyword
    * (CURRENT_DEFAULT / EXISTS_DEFAULT ride the relation's output).
    * Batches that omit the column entirely (DataFrame API) still hit
    * the library's write-default in [[Versioned.appendCommit]]. */
  override def columns(): Array[Column] = cachedColumns

  private lazy val cachedColumns: Array[Column] = {
    val defs: Map[String, String] =
      if (readVersion <= 0) Map.empty
      else loadSnapshot.defaults.map { case (phys, sql) =>
        loadSnapshot.logicalName(phys).getOrElse(phys) -> sql }.toMap
    schema().fields.map { f =>
      defs.get(f.name).flatMap { sql =>
        // EXISTS_DEFAULT needs the folded constant; a non-foldable
        // default falls back to a plain column (write-default still
        // applies when the column is omitted from the batch)
        scala.util.Try {
          val parsed = org.apache.spark.sql.catalyst.parser
            .CatalystSqlParser.parseExpression(sql)
          val v = org.apache.spark.sql.catalyst.expressions
            .Cast(parsed, f.dataType).eval(null)
          Column.create(f.name, f.dataType, f.nullable, null,
            new org.apache.spark.sql.connector.catalog.ColumnDefaultValue(
              sql, org.apache.spark.sql.GraftShims.v2Literal(v, f.dataType)
                .asInstanceOf[org.apache.spark.sql.connector
                  .expressions.Literal[Any]]), null)
        }.toOption
      }.getOrElse(Column.create(f.name, f.dataType, f.nullable))
    }
  }

  // AUTOMATIC_SCHEMA_EVOLUTION is what makes `MERGE ... WITH SCHEMA
  // EVOLUTION` work through the stock analyzer: Spark 4's
  // ResolveMergeIntoSchemaEvolution fires on the flag + this
  // capability, computes the TableChanges from the source schema, and
  // routes them through [[GraftCatalog.alterTable]] — i.e. the same
  // metadata-only ADD COLUMN / widening commits the explicit DDL path
  // uses — then reloads the table so the merge resolves against the
  // evolved schema. No graft-side merge code needs to know.
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.AUTOMATIC_SCHEMA_EVOLUTION)

  /** `SHOW TBLPROPERTIES graft.t` / DESCRIBE EXTENDED surface: the
    * snapshot's declarative state as key-value pairs (read-side
    * rendering — properties are SET through the versioned DDL commits,
    * never through catalog metadata edits). */
  override def properties(): util.Map[String, String] = {
    val m = new util.HashMap[String, String]()
    // ONLY the no-commits case maps to empty properties — checked
    // EXPLICITLY (readVersion = -1 exactly and only then; corrupt
    // manifests and failed validations must surface, not masquerade
    // as a property-less table). The LOAD-pinned snapshot keeps
    // DESCRIBE/SHOW TBLPROPERTIES consistent with what this same
    // loaded instance's reads return under racing commits.
    if (readVersion > 0) {
      val snap = loadSnapshot
      snap.statsCol.foreach(k =>
        m.put("key", snap.logicalName(k).getOrElse(k)))
      m.put("version", snap.version.toString)
      snap.identity.foreach { case (c, _) => m.put("identity", c) }
      snap.constraints.foreach { case (n, e) => m.put(s"check.$n", e) }
      snap.generated.foreach { case (n, e) => m.put(s"generated.$n", e) }
    }
    m
  }

  /** Scan of the pinned version. Time travel needs NOTHING here:
    * `versionAsOf`/`timestampAsOf` are Spark's RESERVED time-travel
    * read options — the framework extracts them and calls
    * `loadTable(ident, version|timestampMicros)` (the same hooks SQL
    * `VERSION/TIMESTAMP AS OF` uses), so a
    * `spark.read.option("versionAsOf", 2).table("graft.t")` arrives
    * here as a table already pinned at version 2, schema and data
    * together (schema-as-of: a column widened later reads at its
    * as-of type under its as-of name — pinned in GraftCatalogSpec).
    * Supplying both options is rejected by Spark's TimeTravelSpec.
    *
    * The builder carries the two scan surfaces a BARE-catalog session
    * (no GraftExtensions, so no scan inline) can actually use
    * (without them `SELECT a FROM graft.t WHERE k = 5` reads every
    * column of every file):
    *   - filter pushdown: translatable predicates re-applied INSIDE
    *     the inner plan, where [[VersionedFileIndex]] turns them into
    *     manifest min/max + bloom file skips and the parquet reader
    *     into row-group skips. ALL filters are returned as residual
    *     (file skipping is pruning, not exact evaluation), so Spark
    *     re-evaluates above and partial translation can only lose
    *     pruning, never rows — same contract as [[GraftRelation]].
    *   - column pruning: pruned to the table's TOP-LEVEL fields named
    *     by Spark's required schema (nested pruning stays above — a
    *     V1 fallback relation must hand back exactly `readSchema()`).
    * Statistics are deliberately NOT reported here: Spark 4's
    * V1ScanWrapper implements only `Scan`, so a
    * `SupportsReportStatistics` on the V1Scan never reaches join
    * planning — manifest-stats broadcast planning is the inline
    * rule's job ([[graft.plans.GraftScanInline]]); bare-catalog
    * sessions fall back to defaultSizeInBytes like any V1 bridge. */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownFilters
        with SupportsPushDownRequiredColumns {
      import org.apache.spark.sql.sources.{Filter => V1Filter}
      private var pushed: Array[V1Filter] = Array.empty
      private var required: StructType = GraftTable.this.schema()

      override def pushFilters(filters: Array[V1Filter]): Array[V1Filter] = {
        pushed = filters.filter(f =>
          V1FilterTranslator.toPredicate(f).isDefined)
        filters // all residual: pushdown prunes files, Spark re-checks rows
      }
      override def pushedFilters(): Array[V1Filter] = pushed

      override def pruneColumns(requiredSchema: StructType): Unit = {
        val full = GraftTable.this.schema()
        // keep the table's own top-level fields, in required order —
        // a nested-pruned struct would make relation.schema diverge
        // from readSchema(), which the V1 fallback strategy rejects.
        // The name match honors the session's resolver (the inline
        // rule's contract): under caseSensitive, only exact names
        // bind; under caseInsensitive, a table with columns differing
        // only in case makes the match AMBIGUOUS — fall back to the
        // full schema rather than bind the wrong field
        val caseSensitive = org.apache.spark.sql.SparkSession.active
          .sessionState.conf.caseSensitiveAnalysis
        def matches(a: String, b: String): Boolean =
          if (caseSensitive) a == b else a.equalsIgnoreCase(b)
        val picked = requiredSchema.fields.map(r =>
          full.fields.filter(f => matches(f.name, r.name)))
        required =
          if (picked.exists(_.length != 1)) full
          else StructType(picked.map(_.head))
      }

      override def build(): Scan = new V1Scan {
        override def readSchema(): StructType = required

        override def toV1TableScan[T <: BaseRelation with TableScan](
            context: SQLContext): T = {
          import org.apache.spark.sql.functions.col
          val inner =
            if (readVersion > 0)
              VersionedScan.read(context.sparkSession, path, loadSnapshot)
            else VersionedScan.read(context.sparkSession, path, -1L)
          val filtered = pushed.toSeq
            .flatMap(V1FilterTranslator.toPredicate)
            .foldLeft(inner)(_.filter(_))
          val pruned = filtered.select(
            required.fieldNames.toIndexedSeq.map(c => col(s"`$c`")): _*)
          new GraftFrameRelation(context.sparkSession, pruned)
            .asInstanceOf[T]
        }
      }
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, legacyOverwrite: Boolean): Unit = {
              require(version <= 0,
                s"cannot write to $ident pinned at VERSION AS OF $version")
              val snap = Versioned.snapshot(spark, path)
              val key = snap.statsCol.flatMap(snap.logicalName)
              // a column-list INSERT omitting the IDENTITY column gets
              // it null-filled by Spark's output resolution (a
              // constant-null Alias in the top projection); an omitted
              // identity column is detected from the PLAN — zero
              // execution, and immune to non-deterministic sources
              // where a data probe could see different rows than the
              // commit. A column the plan provably supplies (or an
              // undecidable shape) passes through to appendCommit's
              // ALWAYS refusal.
              //
              // Delta-parity note: an EXPLICIT user NULL is refused in
              // both SQL shapes, because neither renders as a
              // top-level foldable-null Alias — VALUES arrives as a
              // LocalRelation (no projection), and SELECT NULL keeps
              // its projection BELOW the analyzer's by-name
              // projection, whose identity slot then references an
              // attribute. Only Spark's own null-fill (true omission)
              // matches this shape. Pinned in GraftCatalogSpec
              // ("explicit NULL ... is refused in SQL").
              // Shared with GENERATED columns: Spark's column-list
              // resolution null-fills EVERY absent schema column, and a
              // null-filled generated column would otherwise reach the
              // write gate as a supplied (wrong) value instead of being
              // recomputed — dropping the null-fill restores omission
              // semantics for both families.
              def planOmitsIdentity(idCol: String): Boolean =
                org.apache.spark.sql.GraftShims.logicalPlan(data) match {
                  case org.apache.spark.sql.catalyst.plans.logical
                      .Project(exprs, _) =>
                    exprs.find(_.name == idCol).exists { e =>
                      // NOTE: Alias.foldable is hard-false in Catalyst
                      // (named outputs resist constant folding), so the
                      // decision keys off the CHILD being a no-reference
                      // deterministic null — exactly the null-fill shape
                      // output resolution produces
                      e.references.isEmpty && e.deterministic && (e match {
                        case a: org.apache.spark.sql.catalyst.expressions
                            .Alias if a.child.foldable =>
                          a.child.eval(null) == null
                        case _ => false
                      })
                    }
                  case _ => false
                }
              val omittable = snap.identity.map(_._1).toSeq ++
                snap.generated.map(_._1)
              val cleaned = omittable.foldLeft(data) { (df, c) =>
                if (df.columns.contains(c) && planOmitsIdentity(c)) df.drop(c)
                else df
              }
              if (overwrite || legacyOverwrite)
                Versioned.commit(spark, path, cleaned, key, op = "OVERWRITE")
              else
                Versioned.appendCommit(spark, path, cleaned, key)
            }
          }
      }
    }
}
