package graft.rag

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.etl.{Bronze, Silver}
import graft.sources.Lake
import graft.text.Chunkers
import graft.vector.{Embedder, HashingEmbedder}

/** The reference's whole DAG as ONE lazy driver program
  * (SURVEY.md §3.1: scrape >> bronze >> silver >> embed collapses into a
  * single Spark application — no Airflow, no XCom string-passing, no
  * local-disk staging): raw books JSON → bronze → silver (typed,
  * partitioned parquet) → assembled documents → chunk table with
  * ids/metadata → embeddings → question answering via kNN retrieval.
  *
  * Each layer lands as parquet under `lakeDir` (bronze/, silver/,
  * chunks/), so every stage is independently queryable afterwards —
  * the lakehouse contract. The scraper stays an external producer and
  * LLM generation an external consumer, per the engine-scope decision.
  */
object BookPipeline {

  final case class Result(
      question: String,
      prompt: String,
      source: Option[String],
      fallbackUsed: Boolean,
      chunkCount: Long,
      bookCount: Long)

  /** Run the full pipeline and answer `question` from the corpus. */
  def run(
      spark: SparkSession,
      rawJsonDir: String,
      lakeDir: String,
      question: String,
      runId: String = "run",
      embedder: Embedder = HashingEmbedder(64),
      chunker: String => Seq[String] = t => Chunkers.fixedSize(t, 64),
      k: Int = 3): Result = {

    val bronze = Bronze.fromRaw(Lake.readJson(spark, rawJsonDir))
    Lake.writeParquet(bronze, s"$lakeDir/bronze")

    val silver = Silver.fromBronze(Lake.readParquet(spark, s"$lakeDir/bronze"), runId)
    Lake.writeParquetPartitioned(silver, s"$lakeDir/silver", Seq("run_date"))

    val silverBack = Lake.readParquet(spark, s"$lakeDir/silver")
    val chunks = Retrieval.withEmbeddings(
      Retrieval.chunkTable(silverBack, chunker), embedder)
    Lake.writeParquet(chunks, s"$lakeDir/chunks")

    val chunkTable: DataFrame = Lake.readParquet(spark, s"$lakeDir/chunks")
    val row = Retrieval.ask(chunkTable, embedder, question, k).head()
    Result(
      question = question,
      prompt = row.getString(row.fieldIndex("prompt")),
      source = Option(row.getString(row.fieldIndex("source"))),
      fallbackUsed = row.getBoolean(row.fieldIndex("fallback_used")),
      chunkCount = chunkTable.count(),
      bookCount = silverBack.count())
  }
}
