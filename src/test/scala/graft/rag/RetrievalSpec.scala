package graft.rag

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.etl.{Bronze, Silver}
import graft.text.Chunkers
import graft.vector.HashingEmbedder

/** End-to-end retrieval (R1–R8 minus generation) over a books fixture:
  * assembly → chunking with ids/metadata → embedding → kNN → context /
  * source / prompt, plus the refusal fallback. */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val embedder = HashingEmbedder(64)

  private lazy val silver = Silver.fromBronze(Bronze.fromRaw(Seq(
    ("Starlight Atlas", "£10.00", "In stock (5 available)",
      "Maps of constellations and galaxies for astronomers.", "Astronomy", "9",
      "https://example.test/b/astro", "a1", "2025-07-18 10:15:00"),
    ("Bread Baking Basics", "£12.50", "In stock (2 available)",
      "Sourdough starters and oven techniques for bakers.", "Cooking", "4",
      "https://example.test/b/bread", "c1", "2025-07-18 10:15:00"))
    .toDF("title_xpath", "price_xpath", "availability_xpaths", "description_xpaths",
      "category_xpath", "review_count_xpath", "book_url", "id", "scraped_at")), "t")

  private lazy val chunks =
    Retrieval.withEmbeddings(
      Retrieval.chunkTable(silver, t => Chunkers.fixedSize(t, 48)), embedder)

  test("chunk table honors the id/metadata contract") {
    val rows = chunks.orderBy("chunk_id").collect()
    assert(rows.nonEmpty)
    val first = chunks.filter(col("chunk_id") === "book_a1_chunk_0").head()
    val meta = first.getStruct(first.fieldIndex("metadata"))
    assert(meta.getAs[String]("original_book_id") == "a1")
    assert(meta.getAs[String]("book_title") == "Starlight Atlas")
    assert(meta.getAs[String]("book_source_url") == "https://example.test/b/astro")
    assert(meta.getAs[Int]("chunk_number") == 1)
    assert(meta.getAs[Double]("price") == 10.0)
    // chunk numbers are dense and 1-based per book
    val nums = chunks.filter(col("metadata.original_book_id") === "a1")
      .select("metadata.chunk_number").collect().map(_.getInt(0)).sorted
    assert(nums.toSeq == (1 to nums.length))
    // embeddings attached with the right dimension
    assert(first.getSeq[Float](first.fieldIndex("embedding")).length == 64)
  }

  test("ask retrieves on-topic context and the matching source") {
    val out = Retrieval.ask(chunks, embedder, "sourdough oven baking techniques", k = 2)
      .head()
    assert(!out.getBoolean(out.fieldIndex("fallback_used")))
    val context = out.getString(out.fieldIndex("context"))
    assert(context.toLowerCase.contains("bak") || context.toLowerCase.contains("sourdough"),
      s"expected baking context, got: $context")
    assert(out.getString(out.fieldIndex("source")) == "https://example.test/b/bread")
    val prompt = out.getString(out.fieldIndex("prompt"))
    assert(prompt.contains(context) && prompt.contains("sourdough oven baking techniques"))
  }

  test("semantic chunker drives the same pipeline (the reference's R2 configuration)") {
    // Assembled documents have sentence structure ("Title: ... .
    // Category: ... . Description: ..."), which is what the reference
    // semantically chunks (jobs/embedder.py:61-64).
    val semanticChunks = Retrieval.withEmbeddings(
      Retrieval.chunkTable(silver, t => Chunkers.semantic(t, embedder.embed(_))), embedder)
    val rows = semanticChunks.collect()
    assert(rows.nonEmpty)
    // every book contributes at least one chunk; ids follow the contract
    val perBook = semanticChunks.groupBy(col("metadata.original_book_id"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perBook.keySet == Set("a1", "c1") && perBook.values.forall(_ >= 1))
    // retrieval over semantic chunks still lands on the right source
    val out = Retrieval.ask(semanticChunks, embedder, "constellations for astronomers", k = 1)
      .head()
    assert(out.getString(out.fieldIndex("source")) == "https://example.test/b/astro")
  }

  test("ask falls back to the refusal answer on an empty chunk table") {
    val empty = chunks.filter(lit(false))
    val out = Retrieval.ask(empty, embedder, "anything", k = 3).head()
    assert(out.getBoolean(out.fieldIndex("fallback_used")))
    assert(out.getString(out.fieldIndex("prompt")) == Retrieval.RefusalAnswer)
    assert(out.isNullAt(out.fieldIndex("source")))
  }
}
