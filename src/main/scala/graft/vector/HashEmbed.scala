package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Expression-only feature-hash embedding (the hashing trick), designed
  * for ORACLE-CHECKABLE distributed embedding: every step is a Spark
  * built-in expression with an exact ANSI-SQL mirror (md5 prefix hash →
  * dimension index + sign → per-dimension signed counts), so an external
  * engine reproduces the embedding bit-for-bit — unlike the UDF-based
  * [[HashingEmbedder]], which is opaque Scala (JVM `String.hashCode`).
  *
  * Embeddings live as SPARSE (key, idx, v) components, never as dense
  * arrays: cosine against a probe is a broadcast equi-join on the
  * dimension index + one aggregation — the shape that scales to 100 TB
  * of text (component volume ~= token volume; no wide rows, no UDF
  * serialization, full whole-stage codegen). [[toDense]] materializes
  * arrays only at the storage boundary.
  */
object HashEmbed {

  val Dim = 64

  /** Lowercased word tokens, empties dropped (matches
    * `list_filter(string_split_regex(lower(t),'\W+'), ...)`). */
  def tokensLower(c: Column): Column = array_remove(split(lower(c), "\\W+"), "")

  /** 32-bit token hash both engines compute: first 8 md5 hex chars. */
  def tokenHash(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Sparse embedding components for `textCol`: one row per
    * (keyCols..., idx) with the signed token count `v`. Token array is
    * staged and exploded via the outer+filter pattern (see
    * graft.dedup.Dedup) to keep optimizer-inferred filters cheap. */
  def components(
      df: DataFrame, textCol: String, keyCols: Seq[String], dim: Int = Dim): DataFrame = {
    val keyCs = keyCols.map(col)
    val hashed = df
      .select(keyCs :+ tokensLower(col(textCol)).as("__toks"): _*)
      .withColumn("tok", explode_outer(col("__toks")))
      .filter(col("tok").isNotNull)
      .select(keyCs :+ tokenHash(col("tok")).as("h"): _*)
      .select(keyCs ++ Seq(
        pmod(col("h"), lit(dim)).as("idx"),
        when(pmod(shiftright(col("h"), 16), lit(2)) === 0, 1.0).otherwise(-1.0).as("sign")): _*)
    hashed.groupBy((keyCols :+ "idx").map(col): _*).agg(sum("sign").as("v"))
  }

  /** JVM-side mirror of [[components]] for callers that embed inside a
    * scalar function (e.g. the semantic chunker's per-sentence embed,
    * q51): same md5-prefix hash → dimension index + sign → signed
    * counts, returned dense. Every value is an integer-valued float, so
    * dot products and norms computed from it are EXACT doubles — an
    * external engine replaying the md5 rule reproduces downstream
    * cosines bit-for-bit. */
  def embedLocal(text: String, dim: Int = Dim): Array[Float] = {
    val v = new Array[Float](dim)
    if (text == null) return v
    val md = java.security.MessageDigest.getInstance("MD5")
    text.toLowerCase.split("\\W+").foreach { t =>
      if (t.nonEmpty) {
        val hex = md.digest(t.getBytes("UTF-8"))
          .take(4).map(b => f"${b & 0xff}%02x").mkString
        val h = java.lang.Long.parseLong(hex, 16)
        v((h % dim).toInt) += (if (((h >> 16) % 2) == 0) 1f else -1f)
      }
    }
    v
  }

  /** Cosine top-k of `docs` rows against a constant probe text, fully
    * relational: the probe's (tiny) component set broadcasts, a LEFT
    * join + single aggregation produces dot product and norm in one
    * pass, and orderBy+limit plans as TakeOrderedAndProject. All sums
    * are signed-integer-valued doubles — exact, so cross-engine results
    * agree to full precision. */
  def cosineTopK(
      docs: DataFrame, idCol: String, textCol: String, question: String,
      k: Int, dim: Int = Dim): DataFrame = {
    val spark = docs.sparkSession
    val dcomp = components(docs.select(col(idCol), col(textCol)), textCol, Seq(idCol), dim)
    val qdf = spark.range(1).select(lit(question).as("q"))
    val qcomp = components(qdf, "q", Seq.empty, dim)
    val qNorm = qcomp.agg(sqrt(sum(col("v") * col("v"))).as("nq"))
    val scored = dcomp
      .join(broadcast(qcomp.select(col("idx"), col("v").as("qv"))), Seq("idx"), "left")
      .groupBy(idCol)
      .agg(
        sum(col("v") * coalesce(col("qv"), lit(0.0))).as("dp"),
        sqrt(sum(col("v") * col("v"))).as("nd"))
    scored.crossJoin(broadcast(qNorm))
      .select(col(idCol),
        (col("dp") / (col("nd") * col("nq"))).as("cos"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
  }

  /** Dense L2-normalized array form, for storage boundaries that want
    * `array<double>` (e.g. a chunk/vector table). */
  def toDense(comp: DataFrame, keyCol: String, dim: Int = Dim): DataFrame =
    comp.groupBy(col(keyCol))
      .agg(map_from_entries(collect_list(struct(col("idx").cast("int"), col("v"))))
        .as("__m"))
      .select(col(keyCol),
        transform(sequence(lit(0), lit(dim - 1)),
          i => coalesce(element_at(col("__m"), i), lit(0.0))).as("__raw"))
      .select(col(keyCol), col("__raw"),
        sqrt(aggregate(col("__raw"), lit(0.0), (acc, y) => acc + y * y)).as("__n"))
      .select(col(keyCol),
        when(col("__n") === 0.0, col("__raw"))
          .otherwise(transform(col("__raw"), x => x / col("__n"))).as("embedding"))

  /** Dense UNNORMALIZED array form: every component stays a
    * signed-integer-valued double, so cosines computed later from the
    * stored vectors (vec_cosine_sim) equal the raw-component cosine
    * bit-for-bit — normalization would round and break the full-precision
    * oracle contract. */
  def toDenseRaw(comp: DataFrame, keyCol: String, dim: Int = Dim): DataFrame =
    comp.groupBy(col(keyCol))
      .agg(map_from_entries(collect_list(struct(col("idx").cast("int"), col("v"))))
        .as("__m"))
      .select(col(keyCol),
        transform(sequence(lit(0), lit(dim - 1)),
          i => coalesce(element_at(col("__m"), i), lit(0.0))).as("embedding"))
}
