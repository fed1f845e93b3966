package graft.sources

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession, SQLContext}
import org.apache.spark.sql.connector.catalog.{Column, Identifier, SupportsRead, SupportsWrite, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, V1Scan}
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
class GraftCatalog extends TableCatalog {
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

  private def pathOf(ident: Identifier): String =
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

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        ident.namespace().toSeq :+ ident.name())
    new GraftTable(pathOf(ident), ident.toString, -1L)
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

  override def createTable(ident: Identifier, columns: Array[Column],
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "graft tables take no PARTITIONED BY — set TBLPROPERTIES('key') " +
        "for clustered layout (range-partitioned, stats-pruned files)")
    val p = pathOf(ident)
    require(Versioned.latestVersion(spark, p) == 0,
      s"table $ident already exists")
    val schema = StructType(columns.map(c =>
      org.apache.spark.sql.types.StructField(c.name(), c.dataType(),
        c.nullable())))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    Versioned.commit(spark, p, empty,
      Option(properties.get("key")), files = 1, op = "CREATE")
    new GraftTable(p, ident.toString, -1L)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "ALTER rides the library's schema-evolution commits " +
        "(Versioned.addColumn/renameColumn/dropColumn/widenColumn) — " +
        "they are versioned, conflict-checked operations, not metadata edits")

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

/** One versioned table behind the DSv2 [[Table]] interface, pinned at
  * `version` (-1 = latest-at-read). */
final class GraftTable(path: String, ident: String, version: Long)
    extends Table with SupportsRead with SupportsWrite {

  private def spark = SparkSession.active

  override def name(): String = ident

  override def schema(): StructType =
    VersionedScan.read(spark, path, version).schema

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new V1Scan {
        override def readSchema(): StructType = GraftTable.this.schema()
        override def toV1TableScan[T <: BaseRelation with TableScan](
            context: SQLContext): T =
          new GraftFrameRelation(context.sparkSession,
            VersionedScan.read(context.sparkSession, path, version))
            .asInstanceOf[T]
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
              if (overwrite || legacyOverwrite)
                Versioned.commit(spark, path, data, key, op = "OVERWRITE")
              else
                Versioned.appendCommit(spark, path, data, key)
            }
          }
      }
    }
}
