package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the harness fixture tables (TESTDATA.md / FIXTURES.md).
  *
  * Thin by design: `spark.read.parquet` already gives a vectorized,
  * pushdown-capable columnar scan — filters and column pruning authored on
  * top of these DataFrames reach the Parquet reader via Catalyst
  * (`PushedFilters` / `ReadSchema` in the formatted plan), which is the
  * scale path for a 100 TB lake. Nothing is cached or collected here.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(MICROS, isAdjustedToUTC=false),
    * which Spark surfaces as TIMESTAMP_NTZ. The session timezone is
    * pinned to UTC (graft.Sessions.local / Verify / Bench), so casting
    * to the session-zoned TimestampType is the identical instant —
    * DuckDB reads the same column as its naive TIMESTAMP, so oracle
    * comparisons agree exactly. Downstream event-time logic (windows,
    * watermarks, epoch arithmetic) then runs on plain TimestampType. */
  def events(s: SparkSession, d: String): DataFrame =
    table(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
