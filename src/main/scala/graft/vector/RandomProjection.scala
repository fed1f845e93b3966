package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss RANDOM PROJECTION for embedding columns: a
  * deterministic ±1 (Achlioptas) matrix shrinks `dims`-d vectors to
  * `k`-d sketches whose dot products approximate the originals'.
  * What this buys a 100 TB pipeline: every downstream ANN index,
  * shuffle and storage tier works on k/dims of the bytes, and the
  * projection itself is a PER-ROW map — `zip_with`/`aggregate` HOFs
  * against k sign-literal arrays, codegen'd, no explode, no shuffle,
  * no UDF (contrast an explode+groupBy matrix multiply: a corpus-sized
  * shuffle for what is algebraically a map).
  *
  * Determinism contract: matrix entries are md5-seeded
  * (`sign(d, j)` = parity of the first 8 hex chars of
  * md5("rp_d_j")), and inputs are quantized to integer milliunits
  * before the sums — integer arithmetic is exact and associative, so
  * results are identical across partitionings, engines (DuckDB
  * recomputes the same md5), and cluster sizes.
  *
  * The reference embeds at fixed 384-d with no reduction stage
  * (/root/reference/jobs/embedder.py:45-50); this is the standard
  * sketch it would need the day index memory becomes the bottleneck.
  */
object RandomProjection {

  /** ±1 matrix entry for input dim `d`, output dim `j` — engine-
    * reproducible (same digest as SQL md5('rp_' || d || '_' || j)). */
  def sign(d: Int, j: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"rp_${d}_$j".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    if (java.lang.Long.parseLong(hex.take(8), 16) % 2 == 0) 1L else -1L
  }

  /** Integer milliunit quantization of a float/double array column —
    * floor(x*1000 + 0.5) matches DuckDB digit-for-digit on negatives
    * (plain round ties differ across engines). */
  def quantize(arr: Column): Column =
    transform(arr, x => floor(x.cast("double") * 1000 + 0.5).cast("long"))

  /** Project `embedCol` of `df` to a k-long integer sketch column
    * `out` — one codegen'd pass, no shuffle. */
  def project(df: DataFrame, embedCol: String, out: String,
      dims: Int = 64, k: Int = 16): DataFrame = {
    val qx = quantize(col(embedCol))
    def at(j: Int): Column = {
      val signs = array((0 until dims).map(d => lit(sign(d, j))): _*)
      aggregate(zip_with(qx, signs, (a, b) => a * b),
        lit(0L), (acc, v) => acc + v)
    }
    df.withColumn(out, array((0 until k).map(at): _*))
  }

  /** Integer dot product of two equal-length long-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)
}
