package graft.text

/** Deterministic document chunkers (SURVEY.md §7.3 decision 1).
  *
  * The reference chunks with LangChain's `SemanticChunker` over a neural
  * embedding model (`/root/reference/jobs/embedder.py:31-41`) — splitting
  * where the cosine distance between consecutive sentence-group embeddings
  * exceeds the 95th-percentile breakpoint. That *rule* is reproduced in
  * [[semantic]]; the embedding source is pluggable ([[graft.vector.Embedder]])
  * so the engine stays deterministic and egress-free.
  *
  * All chunkers are pure `String => Seq[String]` functions, applied
  * distributed via UDF + `posexplode` (never a driver-side collect — the
  * reference's `.collect()` at `/root/reference/jobs/embedder.py:54` is the
  * anti-pattern this replaces).
  */
object Chunkers {

  /** Fixed-width chunks of `width` Unicode CODE POINTS (not UTF-16 code
    * units) — matches how SQL engines (the DuckDB oracle's `length`/
    * `substr`) count characters, so chunk counts agree even for non-BMP
    * input (emoji, CJK extensions). Oracle-testable baseline (q23). */
  def fixedSize(text: String, width: Int): Seq[String] = {
    if (text == null || text.isEmpty) return Seq.empty
    val out = Seq.newBuilder[String]
    var i = 0
    val n = text.length
    while (i < n) {
      val end =
        try text.offsetByCodePoints(i, width)
        catch { case _: IndexOutOfBoundsException => n }
      out += text.substring(i, end)
      i = end
    }
    out.result()
  }

  /** Sentence chunks: split after `.`, `!`, `?` followed by whitespace. */
  def sentences(text: String): Seq[String] =
    if (text == null || text.isEmpty) Seq.empty
    else text.split("(?<=[.!?])\\s+").toSeq.filter(_.nonEmpty)

  /** Sliding token windows with overlap — the shape used for shingling
    * and for embedding-context windows. */
  def tokenWindows(text: String, window: Int, stride: Int): Seq[String] = {
    if (text == null || text.isEmpty) return Seq.empty
    val toks = text.split("\\s+").filter(_.nonEmpty)
    if (toks.isEmpty) Seq.empty
    else if (toks.length <= window) Seq(toks.mkString(" "))
    else toks.sliding(window, stride).map(_.mkString(" ")).toSeq
  }

  /** Semantic chunking: group sentences, embed each group, and split at
    * breakpoints where cosine distance between consecutive groups exceeds
    * the given percentile of all consecutive distances (the reference's
    * SemanticChunker rule with its default 95th percentile).
    *
    * @param embed pluggable sentence embedding (deterministic by default)
    */
  def semantic(
      text: String,
      embed: String => Array[Float],
      percentile: Double = 95.0): Seq[String] = {
    val sents = sentences(text)
    if (sents.length <= 1) return sents
    val vecs = sents.map(embed)
    val dists = vecs.sliding(2).map { case Seq(a, b) => 1.0 - cosine(a, b) }.toArray
    val sorted = dists.sorted
    // nearest-rank percentile over consecutive-pair distances
    val rank = math.min(sorted.length - 1,
      math.max(0, math.ceil(percentile / 100.0 * sorted.length).toInt - 1))
    val threshold = sorted(rank)
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder(sents.head)
    var i = 1
    while (i < sents.length) {
      if (dists(i - 1) > threshold) {
        out += cur.toString
        cur.clear()
        cur ++= sents(i)
      } else {
        cur ++= " "
        cur ++= sents(i)
      }
      i += 1
    }
    out += cur.toString
    out.result()
  }

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      i += 1
    }
    val den = math.sqrt(na) * math.sqrt(nb)
    if (den == 0.0) 0.0 else dot / den
  }
}
