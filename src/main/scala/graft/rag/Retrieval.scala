package graft.rag

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.vector.Embedder

/** The reference's retrieval pipeline as engine components
  * (SURVEY.md §2-A R1-R8; `/root/reference/jobs/embedder.py:63-87` and
  * `/root/reference/src/api.py:38-78`) — everything except LLM
  * generation, which stays an external pluggable call.
  *
  * All stages are lazy DataFrame transforms; chunking runs distributed
  * via generator explosion, never the reference's driver-side
  * `collect()` (`jobs/embedder.py:54`).
  */
object Retrieval {

  /** R6 separator (`src/api.py:44`). */
  val ContextSeparator = "\n\n---\n\n"

  /** R8 fallback when retrieval returns no context. */
  val RefusalAnswer = "No relevant context was found to answer this question."

  /** R7 instruction template (context first, then the question). */
  val PromptTemplate: String =
    "Answer strictly from the context below.\n\nContext:\n%s\n\nQuestion: %s\nAnswer:"

  /** R1: document assembly (`jobs/embedder.py:63`). */
  def assembleDocument(title: Column, category: Column, description: Column): Column =
    format_string("Title: %s. Category: %s. Description: %s",
      title, category, coalesce(description, lit("")))

  /** R2+R3: explode silver books into the chunk/vector table contract —
    * chunk id `book_{id}_chunk_{i}` (0-based i), 1-based `chunk_number`,
    * 6-field metadata struct (`jobs/embedder.py:63-87`). The chunker is
    * a pure `String => Seq[String]`; `posexplode_outer` + null filter
    * keeps the (deterministic) chunker UDF out of optimizer-inferred
    * pre-filters (see graft.dedup.Dedup.explodeStaged). */
  def chunkTable(silver: DataFrame, chunker: String => Seq[String]): DataFrame = {
    val chunkUdf = udf(chunker)
    silver
      .select(col("id"), col("title"), col("book_url"), col("category"), col("price"),
        assembleDocument(col("title"), col("category"), col("description")).as("document"))
      .withColumn("chunks", chunkUdf(col("document")))
      .select(col("id"), col("title"), col("book_url"), col("category"), col("price"),
        posexplode_outer(col("chunks")).as(Seq("pos", "chunk")))
      .filter(col("chunk").isNotNull)
      .select(
        format_string("book_%s_chunk_%d", col("id"), col("pos")).as("chunk_id"),
        col("chunk").as("document"),
        struct(
          col("id").as("original_book_id"),
          col("title").as("book_title"),
          col("book_url").as("book_source_url"),
          (col("pos") + 1).cast("int").as("chunk_number"),
          col("category"),
          col("price")).as("metadata"))
  }

  /** R4: attach embeddings to the chunk table. */
  def withEmbeddings(chunks: DataFrame, embedder: Embedder): DataFrame =
    chunks.withColumn("embedding", embedder.embedCol(col("document")))

  /** R5–R8: embed the question, take the k nearest chunks by L2 (the
    * reference's metric — Chroma default space, `jobs/embedder.py:47-50`),
    * assemble context/source/prompt with the refusal fallback. Returns
    * one row: (question, context, source, prompt, fallback_used).
    * Deterministic: ties broken on chunk_id, context ordered by
    * (distance, chunk_id). */
  def ask(chunks: DataFrame, embedder: Embedder, question: String, k: Int = 3): DataFrame = {
    val qVec = embedder.embed(question).map(_.toDouble).toSeq
    val top = graft.vector.Knn
      .exactTopK(chunks, "embedding", "chunk_id", qVec, k, metric = "l2")
      .withColumnRenamed("score", "dist")
    val ranked = array_sort(collect_list(struct(
      col("dist"), col("chunk_id"), col("document"),
      col("metadata.book_source_url").as("src"))))
    top
      .agg(
        array_join(transform(ranked, x => x.getField("document")), ContextSeparator)
          .as("context"),
        try_element_at(transform(ranked, x => x.getField("src")), lit(1)).as("top_source"))
      .select(
        lit(question).as("question"),
        col("context"),
        when(length(col("context")) === 0, lit(null)).otherwise(col("top_source"))
          .as("source"),
        when(length(col("context")) === 0, lit(RefusalAnswer))
          .otherwise(format_string(PromptTemplate, col("context"), lit(question)))
          .as("prompt"),
        (length(col("context")) === 0).as("fallback_used"))
  }
}
