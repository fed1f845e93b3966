package graft.etl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.SilverBook

class BronzeSilverSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val fullRaw = Seq(
    ("A Light in the Attic", "£51.77", "In stock (22 available)",
      "A classic.", "Poetry", "3",
      "https://example.test/b/1", "b1", "2025-07-18 10:15:00"),
    ("Sharp Objects", "£47.82", "Out of stock",
      "Dark.", "Mystery", "0",
      "https://example.test/b/2", "b2", "2025-07-18 10:16:00"))
    .toDF("title_xpath", "price_xpath", "availability_xpaths", "description_xpaths",
      "category_xpath", "review_count_xpath", "book_url", "id", "scraped_at")

  test("bronze renames only present columns; absent optionals survive") {
    val ragged = fullRaw.drop("description_xpaths", "review_count_xpath")
    val bronze = Bronze.fromRaw(ragged)
    assert(bronze.columns.toSet ==
      Set("title", "price", "availability", "category", "book_url", "id", "scraped_at"))
  }

  test("silver implements the declared typed contract (price double, quantity defaulted)") {
    val silver = Silver.fromBronze(Bronze.fromRaw(fullRaw), runId = "t")
    val rows = Silver.typed(silver).collect().sortBy(_.id)
    val b1 = rows.head
    assert(b1 == SilverBook("t", "2025-07-18", "A Light in the Attic",
      Some(51.77), "£51.77", "£", 22, "In stock ",
      Some("A classic."), "Poetry", Some(3),
      "https://example.test/b/1", "2025-07-18 10:15:00", "b1"))
    val b2 = rows(1)
    assert(b2.price.contains(47.82))
    assert(b2.quantity == 0, "no parenthesized count -> quantity defaults to 0")
    assert(b2.stock_status == "Out of stock")
  }

  test("silver survives a wholly-absent optional column (ragged raw schema)") {
    val silver = Silver.fromBronze(Bronze.fromRaw(fullRaw.drop("description_xpaths")), "t")
    val rows = silver.select("description").collect()
    assert(rows.forall(_.isNullAt(0)))
  }

  test("regex derivations round-trip: currency_symbol + price reconstructs price_text") {
    // SURVEY §5.2 property — over the full deterministic books fixture
    // derived from part, not a hand-picked sample.
    val raw = graft.operators.PipelineQueries.rawBooks(spark, graft.TestSpark.sf)
    val silver = Silver.fromBronze(Bronze.fromRaw(raw), "t")
    val bad = silver.filter(
      concat(col("currency_symbol"), col("price").cast("string")) =!= col("price_text"))
    assert(bad.count() == 0)
    // and quantity/stock_status partition the availability space
    val q = silver.filter(
      (col("stock_status") === "Out of stock" && col("quantity") =!= 0) ||
      (trim(col("stock_status")) === "In stock" && col("quantity") <= 0))
    assert(q.count() == 0)
  }

  test("ingest columns: uuid format and timestamp format") {
    val stamped = Bronze.withIngestColumns(Seq(("x")).toDF("payload"))
    val row = stamped.select("id", "scraped_at").head()
    assert(row.getString(0).matches("[0-9a-f-]{36}"))
    assert(row.getString(1).matches("\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}"))
  }
}
