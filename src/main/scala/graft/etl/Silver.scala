package graft.etl

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.model.SilverBook

/** Silver stage: bronze strings → the typed analytic schema, as ONE
  * select (the reference stacks nine `withColumn` projections,
  * `/root/reference/jobs/silver_transformation.py:45-82`; Catalyst
  * collapses them anyway, but a single projection is the honest shape).
  *
  * Implements the DECLARED silver contract with `price: double`
  * (SURVEY.md §1.3 — the reference's cast loop derives the typed price
  * and then drops it in the final projection; consumers re-parse the
  * string, `jobs/embedder.py:79`). Derivations mirror
  * `jobs/silver_transformation.py:45-72`:
  * currency symbol = leading non-digits of the price text; price =
  * remainder cast double; quantity = parenthesized count, defaulted 0;
  * stock status = text before the parenthesis.
  */
object Silver {

  /** Column if present, else typed null — raw/bronze schemas are ragged,
    * and a wholly-absent optional column must not sink the stage. */
  private def c(df: DataFrame, name: String) =
    if (df.columns.contains(name)) col(name) else lit(null).cast("string")

  def fromBronze(bronze: DataFrame, runId: String): DataFrame =
    bronze.select(
      lit(runId).as("run_id"),
      date_format(to_timestamp(c(bronze, "scraped_at")), "yyyy-MM-dd").as("run_date"),
      c(bronze, "title").as("title"),
      regexp_replace(c(bronze, "price"), "^(\\D+)", "").cast("double").as("price"),
      c(bronze, "price").as("price_text"),
      regexp_extract(c(bronze, "price"), "^(\\D+)", 1).as("currency_symbol"),
      coalesce(
        nullif(regexp_extract(c(bronze, "availability"), "\\((\\d+)", 1), lit(""))
          .cast("int"),
        lit(0)).as("quantity"),
      regexp_extract(c(bronze, "availability"), "^([^\\(]+)", 1).as("stock_status"),
      c(bronze, "description").as("description"),
      c(bronze, "category").as("category"),
      c(bronze, "review_count").cast("int").as("review_count"),
      c(bronze, "book_url").as("book_url"),
      c(bronze, "scraped_at").as("scraped_at"),
      c(bronze, "id").as("id"))

  /** Compile-time-checked boundary at the silver contract. */
  def typed(silver: DataFrame): Dataset[SilverBook] = {
    val spark = silver.sparkSession
    import spark.implicits._
    silver.as[SilverBook]
  }
}
