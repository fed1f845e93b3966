package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bronze stage: normalize raw scraped records into the bronze column
  * contract (reference: `/root/reference/jobs/bronze_transformation.py`).
  */
object Bronze {

  /** Raw→bronze rename map (`jobs/bronze_transformation.py:21-30`).
    * Applied only for columns PRESENT in the input — raw schemas are
    * ragged (every xpath key is optional; `jobs/scraper.py:159-166`).
    * The reference's `scrape_at→scraped_at` entry is a latent no-op (the
    * raw key is already `scraped_at`, `jobs/scraper.py:172`) and is
    * intentionally not reproduced. */
  val RenameMap: Seq[(String, String)] = Seq(
    "title_xpath" -> "title",
    "price_xpath" -> "price",
    "availability_xpaths" -> "availability",
    "description_xpaths" -> "description",
    "category_xpath" -> "category",
    "review_count_xpath" -> "review_count")

  /** Rename present columns; leave the rest of the schema as inferred. */
  def fromRaw(raw: DataFrame): DataFrame =
    RenameMap.foldLeft(raw) { case (df, (from, to)) =>
      if (df.columns.contains(from)) df.withColumnRenamed(from, to) else df
    }

  /** R9: the always-present per-record ingest columns the scraper stamps
    * (`jobs/scraper.py:171-172`) — uuid id + formatted ingest time. For
    * producers that don't supply them. Nondeterministic by nature; used
    * on the ingest path, never inside oracle-checked queries. */
  def withIngestColumns(df: DataFrame): DataFrame =
    df.withColumn("id", expr("uuid()"))
      .withColumn("scraped_at", date_format(current_timestamp(), "yyyy-MM-dd HH:mm:ss"))
}
