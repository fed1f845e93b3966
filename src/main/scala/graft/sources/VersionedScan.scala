package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, ArrayContains, Attribute, EmptyRow, EqualNullSafe, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal, Lower, Murmur3Hash, Or, Pmod, StringSplit}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.Versioned.{ColStat, DataFile, Snapshot}

/** Catalyst-integrated data skipping for the versioned table: a
  * [[FileIndex]] whose `listFiles` consults the manifest's per-file
  * footer stats (and bloom bitsets) against the DATA FILTERS Catalyst
  * collected for the scan — so ANY `df.filter(...)` over a versioned
  * read prunes files inside plan execution, with no special read API.
  * This is Delta's TahoeFileIndex shape: the explicit
  * [[Versioned.readKeyRange]] / [[Versioned.readColRange]] /
  * [[Versioned.readPointLookup]] entry points remain the
  * driver-arithmetic fast paths, while this index gives the same
  * skipping to plain DataFrame/SQL expressions composed by users who
  * never see the manifest.
  *
  * Scale properties (the reasons this exists at 100 TB):
  *  - planning is O(files) DRIVER ARITHMETIC over the already-parsed
  *    manifest — no filesystem listing, no footer I/O. `FileStatus`es
  *    are SYNTHESIZED from the manifest's recorded sizes (Delta does
  *    exactly this from add-file `size`), so a million-file table
  *    plans without a single namenode/S3 round-trip;
  *  - `sizeInBytes` reports the manifest's physical byte sum, so a
  *    small versioned dimension AUTO-BROADCASTS in joins without the
  *    user hinting `broadcast(...)` — the optimizer sees a real size
  *    instead of a default;
  *  - admission is CONSERVATIVE: any un-translatable predicate, missing
  *    stat, or type mismatch admits the file. Pruning can only drop a
  *    file whose recorded [min,max]/null-count/bloom provably excludes
  *    every matching row, so results are exact regardless of layout.
  *
  * The reference has no scan planning of its own: every request
  * rebuilds its embedding model and ChromaDB clients from scratch and
  * delegates the scan wholesale to the external store
  * (`/root/reference/src/api.py:24-42`); this index is what gives the
  * lakehouse side "read what the predicate can touch" without one.
  */
final class VersionedFileIndex(
    @transient private val spark: SparkSession,
    table: String,
    snap: Snapshot,
    filesOf: Option[Seq[DataFile]] = None) extends FileIndex {

  private val resolved: Seq[(DataFile, FileStatus)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    filesOf.getOrElse(snap.files).map { f =>
      // fully qualify (scheme + root): `_metadata.file_path` must render
      // exactly as the DV writer recorded it, and synthesized statuses
      // must match what a real listing would return
      val raw = Versioned.resolve(table, f.path)
      val p = raw.getFileSystem(conf).makeQualified(raw)
      val st =
        if (f.bytes > 0L) new FileStatus(f.bytes, false, 1, 128L << 20, 0L, p)
        else // pre-stats manifest: one metadata round-trip, still no data I/O
          p.getFileSystem(conf).getFileStatus(p)
      (f, st)
    }
  }

  override def rootPaths: Seq[Path] = Seq(new Path(table))

  /** Exact logical row count of the files this index serves, from the
    * manifest alone — `None` when the snapshot carries a deletion
    * vector (physical ≠ logical rows) or any file predates recorded
    * counts. Consumed by [[graft.plans.MetadataOnlyCount]]. */
  def exactRowCount: Option[Long] =
    if (snap.dv.isDefined) None
    else Some(filesOf.getOrElse(snap.files).map(_.rows).sum)

  /** Exact [min, max] of a LONG-domain physical column across the
    * served files, manifest-only: defined iff no DV, at least one
    * file, and EVERY file records the stat at the long domain (a file
    * whose column is all-null records none, which correctly declines
    * — its rows contribute nothing to min/max but we cannot know that
    * without the record). Numeric footer stats are exact; consumed by
    * [[graft.plans.MetadataOnlyCount]]. */
  def statLongRange(phys: String): Option[(Long, Long)] = {
    val fs = filesOf.getOrElse(snap.files)
    if (snap.dv.isDefined || fs.isEmpty) None
    else {
      val rs = fs.map(_.stats.get(phys).flatMap(_.longRange))
      if (rs.exists(_.isEmpty)) None
      else Some((rs.map(_.get._1).min, rs.map(_.get._2).max))
    }
  }

  /** [[statLongRange]] for the double domain. */
  def statDoubleRange(phys: String): Option[(Double, Double)] = {
    val fs = filesOf.getOrElse(snap.files)
    if (snap.dv.isDefined || fs.isEmpty) None
    else {
      val rs = fs.map(_.stats.get(phys).collect {
        case cs if cs.typ == "double" => (cs.mn.toDouble, cs.mx.toDouble)
      })
      if (rs.exists(_.isEmpty)) None
      else Some((rs.map(_.get._1).min, rs.map(_.get._2).max))
    }
  }

  override def partitionSchema: StructType = StructType(Nil)

  override def inputFiles: Array[String] =
    resolved.map(_._2.getPath.toString).toArray

  override def sizeInBytes: Long = math.max(1L, resolved.map(_._2.getLen).sum)

  override def refresh(): Unit = () // snapshot-pinned: nothing to refresh

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val admitted = resolved.collect {
      case (f, st) if dataFilters.forall(admits(f, _)) => st
    }
    Seq(PartitionDirectory(InternalRow.empty, admitted.toArray))
  }

  /** The manifest entries a set of RESOLVED data filters cannot rule
    * out — the same conservative `admits` the scan path uses, exposed
    * for WRITE-side file classification ([[Versioned.deleteWhere]]'s
    * copy-on-write split: rewrite these, carry the rest by
    * reference). */
  private[sources] def admittedEntries(
      dataFilters: Seq[Expression]): Seq[DataFile] =
    resolved.collect {
      case (f, _) if dataFilters.forall(admits(f, _)) => f
    }

  /** May `f` contain a row satisfying `e`? Filters arrive over the scan
    * output, i.e. PHYSICAL column names — the same names the stats map
    * is keyed by (Catalyst substitutes the logical→physical aliases
    * when pushing filters through the mapping projection). */
  private def admits(f: DataFile, e: Expression): Boolean = e match {
    case And(l, r) => admits(f, l) && admits(f, r)
    case Or(l, r) => admits(f, l) || admits(f, r)
    case EqualTo(a: Attribute, l @ Literal(v, _)) if v != null =>
      eqAdmits(f, a.name, l)
    case EqualTo(l @ Literal(v, _), a: Attribute) if v != null =>
      eqAdmits(f, a.name, l)
    case EqualNullSafe(a: Attribute, l @ Literal(v, _)) if v != null =>
      eqAdmits(f, a.name, l)
    case GreaterThan(a: Attribute, Literal(v, _)) if v != null =>
      cmpMax(f, a.name, v).forall(_ > 0)
    case GreaterThan(Literal(v, _), a: Attribute) if v != null =>
      cmpMin(f, a.name, v).forall(_ < 0)
    case GreaterThanOrEqual(a: Attribute, Literal(v, _)) if v != null =>
      cmpMax(f, a.name, v).forall(_ >= 0)
    case GreaterThanOrEqual(Literal(v, _), a: Attribute) if v != null =>
      cmpMin(f, a.name, v).forall(_ <= 0)
    case LessThan(a: Attribute, Literal(v, _)) if v != null =>
      cmpMin(f, a.name, v).forall(_ < 0)
    case LessThan(Literal(v, _), a: Attribute) if v != null =>
      cmpMax(f, a.name, v).forall(_ > 0)
    case LessThanOrEqual(a: Attribute, Literal(v, _)) if v != null =>
      cmpMin(f, a.name, v).forall(_ <= 0)
    case LessThanOrEqual(Literal(v, _), a: Attribute) if v != null =>
      cmpMax(f, a.name, v).forall(_ >= 0)
    case In(a: Attribute, vs) if vs.nonEmpty && vs.forall {
        case Literal(v, _) => v != null; case _ => false } =>
      vs.exists { case l: Literal => eqAdmits(f, a.name, l) }
    // the optimizer rewrites In past spark.sql.optimizer.
    // inSetConversionThreshold (default 10) into InSet over INTERNAL
    // values — without this case every serving-sized id list (an ANN
    // pool fetch, a point-lookup batch) silently loses file skipping
    case inset: org.apache.spark.sql.catalyst.expressions.InSet
        if inset.child.isInstanceOf[Attribute] && inset.hset != null &&
          !inset.hset.contains(null) =>
      val a = inset.child.asInstanceOf[Attribute]
      inset.hset.exists(v => eqAdmits(f, a.name, Literal(v, a.dataType)))
    case IsNull(a: Attribute) =>
      f.stats.get(a.name).flatMap(_.nulls).forall(_ > 0L)
    case IsNotNull(a: Attribute) =>
      !(f.rows > 0L &&
        f.stats.get(a.name).flatMap(_.nulls).contains(f.rows))
    // keyword-search shape over a TOKEN index: the exact tokenization
    // the index recorded — array_contains(split(lower(col), ' '), w).
    // The probe hashes the literal against the per-file token bloom;
    // any other split pattern or missing lower() falls through to scan.
    case ArrayContains(
        StringSplit(Lower(a: Attribute), Literal(sep, _), Literal(-1, _)),
        l @ Literal(w, _))
        if w != null && String.valueOf(sep) == " " =>
      tokenBloomAdmits(f, a.name, l)
    case _ => true // not translatable → must scan
  }

  /** stat.min compared to `v` (negative = min below v); None = cannot
    * decide (missing stat / type mismatch) → caller admits. */
  private def cmpMin(f: DataFile, column: String, v: Any): Option[Int] =
    f.stats.get(column).flatMap(cs => cmpStat(cs, cs.mn, v))

  private def cmpMax(f: DataFile, column: String, v: Any): Option[Int] =
    f.stats.get(column).flatMap(cs => cmpStat(cs, cs.mx, v))

  /** Compare one recorded stat rendering against a literal's INTERNAL
    * value. Stats domains: "long" covers all integral physical types
    * (incl. DATE's epoch-day), "double" covers FLOAT/DOUBLE, "string"
    * is UTF-8 Binary compared by code point ([[Versioned.utf8Compare]],
    * NOT UTF-16 String order).
    *
    * FRACTIONAL literals against long stats are compared in DOUBLE
    * space: the scan path always sees type-coerced filters, but the
    * WRITE-side classification ([[Versioned.deleteWhere]]) resolves
    * raw parsed predicates where `v < 10.5` arrives as a Double
    * literal against a long column — truncating it to 10 would
    * prove-miss a file whose rows match (a silent missed delete).
    * Beyond 2^52 double space loses integer exactness, so the
    * comparison conservatively declines (admit = scan). */
  private def cmpStat(cs: ColStat, stat: String, v: Any): Option[Int] =
    (cs.typ, v) match {
      case ("long", n: Number) =>
        val d = n.doubleValue
        // strict <: Long.MaxValue.toDouble rounds UP to 2^63 exactly, and
        // longValue saturates there — route the boundary to the
        // conservative branch (which declines past 2^52 → admit).
        if (d == math.floor(d) && !d.isInfinity &&
            math.abs(d) < Long.MaxValue.toDouble)
          Some(java.lang.Long.compare(stat.toLong, n.longValue))
        else if (d.isNaN) None
        else {
          val s = stat.toLong
          if (math.abs(s) > (1L << 52)) None
          else Some(java.lang.Double.compare(s.toDouble, d))
        }
      case ("double", n: Number) =>
        val exact = n match {
          case l: java.lang.Long => math.abs(l.longValue) <= (1L << 52)
          case i: java.lang.Integer => true
          case _: java.lang.Double | _: java.lang.Float => true
          case _ => false
        }
        if (exact)
          Some(java.lang.Double.compare(stat.toDouble, n.doubleValue))
        else None
      case ("string", s: UTF8String) => Some(Versioned.utf8Compare(stat, s.toString))
      case ("string", s: String) => Some(Versioned.utf8Compare(stat, s))
      case _ => None
    }

  private def eqAdmits(f: DataFile, column: String, lit: Literal): Boolean = {
    val range = (cmpMin(f, column, lit.value), cmpMax(f, column, lit.value)) match {
      case (Some(lo), Some(hi)) => lo <= 0 && hi >= 0
      case _ => true
    }
    range && bloomAdmits(f, column, lit)
  }

  /** Bloom probe for equality on the table's indexed column: positions
    * are the SAME `pmod(hash(value, i), bits)` the write path set
    * ([[Versioned.addBloomIndex]]), evaluated here as constant Catalyst
    * expressions — no query, no session state. */
  private def bloomAdmits(f: DataFile, column: String, lit: Literal): Boolean =
    (snap.bloomCfg, f.bloom) match {
      case (Some((c, bits, k)), Some(b64)) if c == column =>
        probe(f, lit, bits, k, b64)
      case _ => true
    }

  /** Token-bloom probe for the keyword-search pattern: the config
    * column carries the tok: marker and names the SPLIT column; the
    * literal is the (already-lowercased-by-the-user) token. */
  private def tokenBloomAdmits(f: DataFile, column: String, lit: Literal): Boolean =
    (snap.bloomCfg, f.bloom) match {
      case (Some((c, bits, k)), Some(b64))
          if Versioned.isTokenCfg(c) && Versioned.bloomPhys(c) == column =>
        probe(f, lit, bits, k, b64)
      case _ => true
    }

  private def probe(f: DataFile, lit: Literal, bits: Int, k: Int,
      b64: String): Boolean = {
    val ps = bloomPositions.getOrElseUpdate(lit,
      (0 until k).map { i =>
        Pmod(new Murmur3Hash(Seq(lit, Literal(i))), Literal(bits))
          .eval(EmptyRow).asInstanceOf[Int]
      })
    val bs = java.util.BitSet.valueOf(
      java.util.Base64.getDecoder.decode(b64))
    ps.forall(bs.get)
  }

  private val bloomPositions =
    scala.collection.mutable.Map.empty[Literal, Seq[Int]]
}

/** Entry point: a versioned snapshot as a pruning-capable DataFrame. */
object VersionedScan {

  /** Full logical read of `table` at `version` through a
    * [[VersionedFileIndex]]: physical parquet scan (file-skipping on
    * any pushed-down predicate) → deletion-vector anti-join →
    * column-mapping projection. Produces the SAME rows as
    * [[Versioned.read]]; differs only in that Catalyst's collected
    * data filters prune files at execution time. User filters written
    * against logical names push through the mapping aliases and the DV
    * anti-join (left-side-only predicates), so skipping still bites
    * under rename and merge-on-read deletes. */
  def read(spark: SparkSession, table: String, version: Long = -1L): DataFrame =
    read(spark, table, Versioned.snapshot(spark, table, version))

  /** As above over an already-resolved snapshot — callers that hold
    * one (e.g. the scan-inline rule's per-query memo) skip the
    * manifest re-read + re-parse. */
  def read(spark: SparkSession, table: String,
      snap: Versioned.Snapshot): DataFrame = {
    val dataSchema = snap.physicalSchema.getOrElse {
      // pre-schema manifest: one footer read of one file, driver-side
      spark.read.parquet(
        Versioned.resolve(table, snap.files.head.path).toString).schema
    }
    def relationOver(files: Seq[DataFile]): DataFrame = {
      val rel = HadoopFsRelation(
        location = new VersionedFileIndex(spark, table, snap,
          if (files == snap.files) None else Some(files)),
        partitionSchema = StructType(Nil),
        dataSchema = dataSchema,
        bucketSpec = None,
        fileFormat = new ParquetFileFormat,
        options = Map.empty)(
        spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
      GraftShims.dataFrame(spark, rel)
    }
    // COLUMN DEFAULTS: files grouped by the defaulted columns they
    // predate (noCols stamps), a pruning relation PER GROUP (each
    // group's FileIndex still consults the same data filters — no
    // skipping is lost), the default expression projected over exactly
    // the missing columns, then one union (Versioned.readFiles's
    // semantics through the Catalyst-integrated scan)
    val base =
      if (snap.initialDefaults.isEmpty) relationOver(snap.files)
      else snap.files.groupBy(_.noCols.toSet).toSeq
        .sortBy(_._1.mkString(","))
        .map { case (missing, fs0) =>
          val b = relationOver(fs0)
            .withColumn("__graft_file", col("_metadata.file_path"))
            .withColumn("__graft_pos", col("_metadata.row_index"))
          snap.initialDefaults.foldLeft(b) { case (df, (phys, e)) =>
            if (missing.contains(phys))
              df.withColumn(phys,
                org.apache.spark.sql.functions.expr(e)
                  .cast(df.schema(phys).dataType))
            else df
          }
        }.reduce(_ unionByName _)
    val dv = Versioned.applyDv(spark, table, snap, base)
      .drop("__graft_file", "__graft_pos")
    snap.mapping match {
      case Some(m) => dv.select(m.map { case (l, p) => col(p).as(l) }: _*)
      case None => dv
    }
  }
}
