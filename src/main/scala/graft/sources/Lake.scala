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

  /** CSV sink with header (§2-B scans/sinks). */
  def writeCsv(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).option("header", "true").csv(path)

  /** CSV scan. Schema is REQUIRED in DDL form — header-based inference
    * is a double scan and silently degrades types at 100 TB; the lake
    * contract is explicit schemas at every text-format boundary. */
  def readCsv(spark: SparkSession, path: String, schemaDdl: String): DataFrame =
    spark.read.option("header", "true").schema(schemaDdl).csv(path)
}
