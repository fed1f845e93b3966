package graft.vector

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Pluggable text-embedding boundary (SURVEY.md §7.3 decision 2).
  *
  * The reference embeds with `all-MiniLM-L6-v2` (384-d) via
  * sentence-transformers (`/root/reference/docker-compose.yaml:71`,
  * `/root/reference/src/api.py:24`). A neural model is an external,
  * non-deterministic dependency; the engine default is a deterministic
  * feature-hash embedder (hashing trick): each token hashes to a
  * dimension index and a sign, vectors are L2-normalized. Any real model
  * drops in behind the same trait without touching engine code.
  */
trait Embedder extends Serializable {
  def dim: Int
  def embed(text: String): Array[Float]

  /** Column form for distributed embedding of a text column (a UDF —
    * the embedding function is opaque Scala by design; the
    * expression-only alternative for oracle-checkable pipelines is
    * [[HashEmbed]]). */
  def embedCol(c: Column): Column = {
    val self = this
    udf((s: String) => self.embed(s)).apply(c)
  }
}

/** Oracle-checkable md5-prefix embedder: the [[HashEmbed.embedLocal]]
  * rule (first-8-hex-chars-of-md5 token hash → dimension + sign) behind
  * the pluggable trait, so pipelines built on [[Embedder]] can run
  * under the external hash gate. Components stay RAW signed counts —
  * integer-valued floats, so every downstream dot product, norm and L2
  * distance is an exact double an external engine reproduces
  * bit-for-bit (normalizing would round and break that; same contract
  * as [[HashEmbed.toDenseRaw]]). */
final case class Md5Embedder(dim: Int = 64) extends Embedder {
  override def embed(text: String): Array[Float] = HashEmbed.embedLocal(text, dim)
}

/** Deterministic hashing-trick embedder. Uses `String.hashCode` (stable
  * by the JVM spec) so results are reproducible across executors/runs. */
final case class HashingEmbedder(dim: Int = 64) extends Embedder {
  override def embed(text: String): Array[Float] = {
    val v = new Array[Float](dim)
    if (text == null) return v
    val toks = text.toLowerCase.split("\\W+")
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      if (tok.nonEmpty) {
        val h = tok.hashCode
        val idx = ((h % dim) + dim) % dim
        val sign = if (((h >>> 16) & 1) == 0) 1.0f else -1.0f
        v(idx) += sign
      }
      t += 1
    }
    var norm = 0.0
    var i = 0
    while (i < dim) { norm += v(i).toDouble * v(i); i += 1 }
    if (norm > 0) {
      val inv = (1.0 / math.sqrt(norm)).toFloat
      i = 0
      while (i < dim) { v(i) *= inv; i += 1 }
    }
    v
  }
}
