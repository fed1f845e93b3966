package graft.model

/** Typed boundaries for the lakehouse layers (SURVEY.md §1).
  *
  * The silver contract implements the reference's DECLARED intent — a
  * typed `price: double` — not its accidental all-string output: the
  * reference's cast loop writes the typed value to a new column that its
  * final projection then drops (`/root/reference/jobs/
  * silver_transformation.py:77-82,117`), forcing downstream re-parses
  * (`jobs/embedder.py:79`). Every consumer treats the value numerically,
  * so the type belongs in the schema (SURVEY.md §1.3 decision).
  */
final case class SilverBook(
    run_id: String,
    run_date: String,
    title: String,
    price: Option[Double],
    price_text: String,
    currency_symbol: String,
    quantity: Int,
    stock_status: String,
    description: Option[String],
    category: String,
    review_count: Option[Int],
    book_url: String,
    scraped_at: String,
    id: String)

/** Chunk metadata contract (`/root/reference/jobs/embedder.py:73-83`). */
final case class ChunkMetadata(
    original_book_id: String,
    book_title: String,
    book_source_url: String,
    chunk_number: Int,
    category: String,
    price: Option[Double])
