package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard. All are built from
  * shuffle-conscious Spark primitives:
  *
  *  - shingling/hashing is pure column-level expression work (codegen'd,
  *    no UDFs);
  *  - MinHash signatures are one `groupBy(doc, hashIdx)` shuffle over the
  *    exploded shingle set;
  *  - LSH banding turns the O(n²) all-pairs problem into an equi-join on
  *    (band, signature) — the only pairs materialized are bucket
  *    collisions, which is what makes near-dup detection feasible at
  *    100 TB (all-pairs is quadratic; banded candidates are ~linear for
  *    realistic dup rates);
  *  - candidate pairs are then verified with exact Jaccard over the
  *    shingle sets (a semi-join back against the shingle table).
  *
  * Hashes are md5-prefix based so an external SQL engine (the DuckDB
  * oracle) reproduces them bit-for-bit.
  */
object Dedup {
  /** 2^31 - 1, the classic MinHash modulus. */
  val P: Long = 2147483647L

  /** Fixed (a, c) parameters for the K=12 MinHash permutations
    * `h_i(x) = (a_i * x + c_i) mod P` — literal on both engine and oracle
    * side so signatures agree exactly. */
  val MinHashParams: Seq[(Int, Int, Int)] = Seq(
    (0, 1103, 12345), (1, 2357, 98765), (2, 4093, 54321), (3, 8191, 13579),
    (4, 16381, 24680), (5, 32749, 11223), (6, 65521, 44556), (7, 131071, 77889),
    (8, 262139, 99001), (9, 524287, 22334), (10, 1048573, 55667), (11, 2097143, 88990))

  /** Rows per LSH band (K=12 hashes → 4 bands of 3). */
  val BandRows = 3

  /** Stable 32-bit token hash both Spark and DuckDB can compute:
    * first 8 hex chars of md5, as a long. */
  def tokenHash(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Stable 60-bit token hash (md5 15-hex prefix) for SimHash. */
  def tokenHash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Whitespace tokens, empties dropped. */
  def tokens(c: Column): Column =
    filter(split(c, "\\s+"), t => length(t) > 0)

  /** Word n-gram shingles as space-joined strings. */
  def shingles(c: Column, n: Int): Column = {
    val toks = tokens(c)
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + lit(1))): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact dedup: survivors per identical text, with duplicate counts. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_cnt"))
      .select("keep_id", "dup_cnt")

  /** Distinct (id, shingle) pairs. */
  def shingleSet(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    docs.select(col(idCol).as("id"), explode(array_distinct(shingles(col(textCol), n))).as("sh"))

  /** MinHash signatures: one row per (id, hash index) with the min hash. */
  def minHashSignatures(sh: DataFrame): DataFrame = {
    val spark = sh.sparkSession
    import spark.implicits._
    val params = MinHashParams.toDF("i", "a", "c")
    sh.withColumn("x", pmod(tokenHash(col("sh")), lit(P)))
      .crossJoin(broadcast(params))
      .groupBy(col("id"), col("i"))
      .agg(min(pmod(col("a") * col("x") + col("c"), lit(P))).as("mh"))
  }

  /** LSH band signatures: (id, band, sig-string). */
  def bandSignatures(sigs: DataFrame): DataFrame =
    sigs.withColumn("band", (col("i") / BandRows).cast("int"))
      .groupBy("id", "band")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("i"), col("mh")))),
          x => x.getField("mh").cast("string")), "-").as("sig"))

  /** Candidate pairs = docs sharing any (band, sig) bucket. */
  def lshCandidates(bands: DataFrame): DataFrame = {
    val a = bands.select(col("band").as("band_a"), col("sig").as("sig_a"), col("id").as("da"))
    val b = bands.select(col("band").as("band_b"), col("sig").as("sig_b"), col("id").as("db"))
    a.join(b, col("band_a") === col("band_b") && col("sig_a") === col("sig_b") &&
        col("da") < col("db"))
      .select("da", "db").distinct()
  }

  /** Exact Jaccard over shingle sets for the given candidate pairs. */
  def jaccardVerify(cands: DataFrame, sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val x = sh.select(col("id").as("da"), col("sh"))
    val y = sh.select(col("id").as("db"), col("sh"))
    val inter = cands.join(x, "da").join(y, Seq("db", "sh"))
      .groupBy("da", "db").agg(count(lit(1)).as("ix"))
    inter
      .join(sizes.select(col("id").as("da"), col("n").as("na")), "da")
      .join(sizes.select(col("id").as("db"), col("n").as("nb")), "db")
      .select(col("da"), col("db"),
        (col("ix").cast("double") / (col("na") + col("nb") - col("ix"))).as("jaccard"))
  }

  /** Full MinHash-LSH near-dup pipeline: shingle → sign → band → bucket
    * join → exact-Jaccard verify → threshold. */
  def minHashNearDups(
      docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, n: Int = 3): DataFrame = {
    val sh = shingleSet(docs, idCol, textCol, n)
    val cands = lshCandidates(bandSignatures(minHashSignatures(sh)))
    jaccardVerify(cands, sh).filter(col("jaccard") >= threshold)
  }

  /** 60-bit SimHash per document (md5-based, multiplicity-weighted). */
  def simHash(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("tok"))
      .withColumn("h", tokenHash60(col("tok")))
      .crossJoin(broadcast(docs.sparkSession.range(60).select(col("id").cast("int").as("j"))))
      .withColumn("bit", expr("shiftright(h, j) % 2"))
      .groupBy("id", "j")
      .agg(sum(when(col("bit") === 1, 1).otherwise(-1)).as("vj"))
      .groupBy("id")
      .agg(sum(when(col("vj") > 0, expr("shiftleft(cast(1 as bigint), j)")).otherwise(0L))
        .as("simhash"))

  /** Exact n-gram Jaccard pairs within a blocking column (e.g. lang). */
  def ngramJaccardPairs(
      docs: DataFrame, idCol: String, textCol: String, blockCol: String,
      threshold: Double, n: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol).as("id"), col(blockCol).as("blk"),
      explode(array_distinct(shingles(col(textCol), n))).as("sh"))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("cnt"))
    val inter = sh.select(col("blk"), col("id").as("da"), col("sh"))
      .join(sh.select(col("blk"), col("id").as("db"), col("sh")), Seq("blk", "sh"))
      .filter(col("da") < col("db"))
      .groupBy("da", "db").agg(count(lit(1)).as("ix"))
    inter
      .join(sizes.select(col("id").as("da"), col("cnt").as("na")), "da")
      .join(sizes.select(col("id").as("db"), col("cnt").as("nb")), "db")
      .select(col("da"), col("db"),
        (col("ix").cast("double") / (col("na") + col("nb") - col("ix"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
