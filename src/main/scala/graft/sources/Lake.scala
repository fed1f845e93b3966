package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lakehouse IO: JSON raw-record scan/sink and partitioned parquet
  * layers (SURVEY.md §2-A S1/S3/S5, §2-B scans/sinks).
  *
  * The reference stages every read/write through local disk and a
  * thread-pooled object-store client (`/root/reference/jobs/
  * silver_transformation.py:98-107,122-126`), which defeats parquet
  * pushdown and pruning; here reads go straight to the source so
  * Catalyst's `PushedFilters`/`ReadSchema` reach the scan, and
  * partitioned writes give partition pruning on the read side — the
  * actual 100 TB layout lever. Against an object store the same calls
  * take `s3a://` URIs unchanged.
  */
object Lake {

  /** Raw JSON scan with schema inference (S1) — the Spark-native
    * replacement for the reference's driver-side fetch + createDataFrame
    * (`jobs/bronze_transformation.py:37-56`). Ragged records simply
    * leave nulls in the union schema. */
  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** Raw JSON sink (S5) — one object per record, as the scraper writes
    * (`jobs/scraper.py:177-179`). Null fields are omitted per record,
    * preserving raw-layer ragged-ness on round-trip. */
  def writeJson(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).json(path)

  /** Parquet layer sink (S3), Hive-partitioned: the engine's version of
    * the reference's `{run_id}/{layer}/{date}/` path convention
    * (`jobs/scraper.py:30`) — but as real partition columns, so the
    * planner prunes partitions instead of the caller pruning paths. */
  def writeParquetPartitioned(
      df: DataFrame, path: String, partitionCols: Seq[String],
      mode: String = "overwrite"): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  /** Plain parquet sink (S3, unpartitioned overwrite). */
  def writeParquet(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).parquet(path)

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Schema-merged parquet scan: batches written over time may have
    * added columns (the raw layer's ragged-ness surviving into
    * parquet); merging unions the schemas, older files read nulls for
    * newer columns. Costs a footer read per file — use at evolving
    * boundaries, not on hot fixed-schema tables. */
  def readParquetMergedSchema(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** Small-file compaction: rewrite a layer into `targetFiles` files at
    * `dst`. Compaction writes to a NEW location — rewriting a path
    * while reading it is undefined; the caller swaps paths (or
    * partitions) atomically at the table layer. */
  def compactTo(spark: SparkSession, src: String, dst: String, targetFiles: Int): Unit =
    readParquet(spark, src).repartition(targetFiles)
      .write.mode("overwrite").parquet(dst)

  /** MERGE/upsert (update-else-insert) over a parquet layer — the
    * lakehouse mutation Delta/Iceberg call `MERGE INTO ... WHEN MATCHED
    * THEN UPDATE WHEN NOT MATCHED THEN INSERT`, expressed Spark-first:
    * matched target rows are replaced by their source row, unmatched
    * source rows are appended, unmatched target rows survive. One
    * anti-join (broadcast when the update set is small — the common
    * upsert shape, AQE picks it) plus a union; never a row-at-a-time
    * path. Generalizes the reference's overwrite-per-run layout
    * (`/root/reference/jobs/bronze_transformation.py:73`) to key-matched
    * mutation. Both inputs must share the target schema (use
    * `unionByName` discipline upstream).
    *
    * Contract (same as Delta/Iceberg MERGE): `source` must have at most
    * ONE row per key — multiple source matches for a target row are
    * ambiguous, and Delta raises on them. Enforced lazily and
    * distributed: a window count over the source keys feeds a
    * raise_error filter, so a duplicate-keyed source fails the merge job
    * at execution instead of silently emitting duplicate rows. NULL keys
    * follow MERGE semantics too: a null key never equi-matches, so
    * null-keyed target rows survive and null-keyed source rows append.
    */
  def mergeUpsert(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val guarded = source
      .withColumn("_graft_kcnt",
        count(lit(1)).over(Window.partitionBy(keys.map(col): _*)))
      // Null-keyed rows are exempt: they never equi-match, so N of them
      // are N legal inserts, not an ambiguous multi-match.
      .where(when(col("_graft_kcnt") === 1 ||
          keys.map(k => col(k).isNull).reduce(_ || _), lit(true)).otherwise(
        raise_error(concat(lit("mergeUpsert: duplicate source rows for key ("),
          concat_ws(",", keys.map(k => col(k).cast("string")): _*), lit(")")))
          .cast("boolean")))
      .drop("_graft_kcnt")
    guarded.unionByName(
      target.join(source.select(keys.map(col): _*), keys, "left_anti"))
  }

  /** Full MERGE grammar / CDC apply (Delta `MERGE ... WHEN MATCHED AND
    * op='D' THEN DELETE / WHEN MATCHED THEN UPDATE / WHEN NOT MATCHED
    * THEN INSERT`; DLT `apply_changes`): apply ONE op-coded change
    * batch — rows carrying I/U/D in `opCol` — to the target in a single
    * pass. Updates of absent keys insert (upsert semantics), deletes of
    * absent keys are no-ops, and a delete always wins over the target
    * row. Shape: one anti-join of the target against ALL batch keys
    * (broadcast when the batch is small — the common CDC case, AQE
    * picks it) + a union with the batch's non-delete rows; the fact
    * side is scanned once and never shuffled. Same at-most-one-row-per-
    * key source contract as [[mergeUpsert]], enforced the same
    * distributed way; null-keyed deletes never equi-match, so they are
    * no-ops, and null-keyed upserts append.
    *
    * `evolveSchema` = Delta's `MERGE ... withSchemaEvolution`: change
    * rows may carry columns the target lacks (and vice versa) — the
    * union fills the missing side with nulls, so untouched target rows
    * read null for the new columns and the evolving commit path
    * ([[Versioned.commit]]'s mergeSchemas) widens the table schema.
    * Off by default: an unexpected column name in a CDC feed should be
    * a loud failure, not a silent schema change. */
  def applyChanges(target: DataFrame, changes: DataFrame, keys: Seq[String],
      opCol: String = "op", evolveSchema: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val guarded = changes
      .withColumn("_graft_kcnt",
        count(lit(1)).over(Window.partitionBy(keys.map(col): _*)))
      .where(when(col("_graft_kcnt") === 1 ||
          keys.map(k => col(k).isNull).reduce(_ || _), lit(true)).otherwise(
        raise_error(concat(lit("applyChanges: duplicate change rows for key ("),
          concat_ws(",", keys.map(k => col(k).cast("string")): _*), lit(")")))
          .cast("boolean")))
      .drop("_graft_kcnt")
    guarded.filter(col(opCol) =!= "D" && col(opCol).isNotNull).drop(opCol)
      .unionByName(
        target.join(changes.select(keys.map(col): _*), keys, "left_anti"),
        allowMissingColumns = evolveSchema)
  }

  /** [[mergeUpsert]] + rewrite: merge `source` into the parquet layer at
    * `path` and atomically-ish swap via a fresh write to `dst` (same
    * contract as [[compactTo]]: never rewrite a path being read). */
  def mergeInto(spark: SparkSession, path: String, dst: String,
      source: DataFrame, keys: Seq[String]): Unit =
    writeParquet(mergeUpsert(readParquet(spark, path), source, keys), dst)

  /** Targeted DELETE (GDPR erasure) over a parquet layer: rewrite the
    * layer at `path` to `dst` without the rows whose key appears in
    * `tombstones` — the Delta/Iceberg `DELETE WHERE key IN (...)`
    * contract over plain parquet. One anti-join; the tombstone side is
    * broadcast (erasure-request batches are small next to the table),
    * so the rewrite is a single scan with no shuffle of the fact side.
    * `tombstones` columns must be named like the target's `keys`. Same
    * swap contract as [[compactTo]]: never rewrite a path being read. */
  def deleteMatching(spark: SparkSession, path: String, dst: String,
      tombstones: DataFrame, keys: Seq[String]): Unit =
    writeParquet(
      readParquet(spark, path).join(
        org.apache.spark.sql.functions.broadcast(tombstones), keys, "left_anti"),
      dst)

  /** CDC / change-data-feed between two keyed snapshots: full-outer
    * join on the key, classify each row insert / update / delete, drop
    * unchanged rows — the Delta `table_changes` surface derived from
    * plain snapshots (so it works on ANY two parquet layers, not only
    * log-backed tables). One shuffle on the key; exchange-free when
    * both snapshots share a bucketed layout on `keys`. Value columns
    * come back prefixed `old_` / `new_`; comparison is null-safe, so a
    * null→value change classifies as update, not unchanged. */
  def snapshotDiff(v1: DataFrame, v2: DataFrame, keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val nonKeys = v1.columns.filterNot(keys.contains).toSeq
    val o = v1.select(keys.map(col) ++ nonKeys.map(c => col(c).as(s"old_$c"))
      :+ lit(true).as("_old_present"): _*)
    val n = v2.select(keys.map(col) ++ nonKeys.map(c => col(c).as(s"new_$c"))
      :+ lit(true).as("_new_present"): _*)
    // reduceOption: a key-only snapshot (no value columns) degrades to
    // insert/delete/unchanged classification instead of throwing.
    val changed = nonKeys
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, keys, "full_outer")
      .withColumn("change_type",
        when(col("_old_present").isNull, lit("insert"))
          .when(col("_new_present").isNull, lit("delete"))
          .when(changed, lit("update"))
          .otherwise(lit("unchanged")))
      .filter(col("change_type") =!= "unchanged")
      .drop("_old_present", "_new_present")
  }

  /** Z-order layout write: sort the whole dataset by the Morton key of
    * `(dimA, dimB)` (range-partitioned so the sort is distributed — no
    * single-task global sort) and land `files` parquet files whose
    * per-file min/max zkey ranges are disjoint. Footer stats then prune
    * range predicates on EITHER dimension, the Delta
    * `OPTIMIZE ZORDER BY` / Iceberg sort-order layout expressed with
    * stock Spark operators. Disjointness is asserted in LakeSpec. */
  def zorderWrite(df: DataFrame, path: String, dimA: String, dimB: String,
      files: Int): Unit = {
    import org.apache.spark.sql.functions.col
    df.withColumn("__zkey",
        graft.functions.ZOrder.interleave16(col(dimA), col(dimB)))
      .repartitionByRange(files, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
      .write.mode("overwrite").parquet(path)
  }

  /** ORC sink/scan — the columnar alternative to parquet (Spark's
    * built-in ORC datasource; same pushdown/pruning surface). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** CSV sink with header (§2-B scans/sinks). */
  def writeCsv(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).option("header", "true").csv(path)

  /** CSV scan. Schema is REQUIRED in DDL form — header-based inference
    * is a double scan and silently degrades types at 100 TB; the lake
    * contract is explicit schemas at every text-format boundary. */
  def readCsv(spark: SparkSession, path: String, schemaDdl: String): DataFrame =
    spark.read.option("header", "true").schema(schemaDdl).csv(path)
}
