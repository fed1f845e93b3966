package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.sources.Tables
import graft.text.{Chunkers, TextFunctions}

/** Text-analysis queries over the `documents` table: tokenization (q22),
  * chunk explosion (q23), language ID (t01), quality scoring (t02),
  * token counting (t03), fingerprinting (t04), bigrams (t05), TF-IDF
  * (t06), the curation composite (t07), repetition scoring (t08),
  * PII redaction (t09), boilerplate detection (t10), and the
  * oracle-gated semantic chunker (q51).
  * All column-level expression work except the chunker UDF (a pure
  * `String => Seq[String]` exploded distributed — never the reference's
  * driver-side collect, `/root/reference/jobs/embedder.py:54`).
  */
object TextQueries {
  type Q = (SparkSession, String) => DataFrame

  private val fixedChunk = udf((s: String) => Chunkers.fixedSize(s, 40))

  val queries: Map[String, Q] = Map(
    // q22: token frequency, English slice.
    "q22_tokens" -> ((s, d) =>
      Tables.documents(s, d)
        .filter(col("lang") === "en")
        .select(explode(TextFunctions.tokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), col("token"))
        .limit(10)),

    // q23: 1→N chunk explosion (fixed 40-char chunker, the deterministic
    // stand-in for semantic chunking — SURVEY.md A.4 R2) + count-back.
    "q23_chunks" -> ((s, d) =>
      Tables.documents(s, d)
        .filter(length(col("text")) > 0)
        .select(col("doc_id"), posexplode(fixedChunk(col("text"))).as(Seq("pos", "chunk")))
        .groupBy("doc_id").agg(count(lit(1)).as("chunk_cnt"))
        .orderBy("doc_id")
        .limit(20)),

    // t01: language ID — token explode → stopword-profile join → per-doc
    // argmax. The profile table is broadcast; the shape scales to real
    // n-gram profile tables unchanged.
    "t01_lang_id" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      val docs = Tables.documents(s, d)
      val profiles = TextFunctions.StopwordProfiles.toDF("p_lang", "tok")
      val toks = docs.select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("tok"))
      val scores = toks.join(broadcast(profiles), "tok")
        .groupBy("doc_id", "p_lang").agg(count(lit(1)).as("hits"))
      val w = Window.partitionBy("doc_id").orderBy(desc("hits"), col("p_lang"))
      val best = scores.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).select(col("doc_id"), col("p_lang"), col("hits"))
      docs.select(col("doc_id"), col("lang"))
        .join(best, Seq("doc_id"), "left")
        .select(col("doc_id"), col("lang"),
          coalesce(col("p_lang"), lit("und")).as("pred_lang"),
          coalesce(col("hits"), lit(0L)).as("stop_hits"))
        .orderBy("doc_id")
    }),

    // t02: quality scoring from length/punctuation/stopword ratios.
    "t02_quality" -> ((s, d) => {
      val docs = Tables.documents(s, d).filter(length(col("text")) > 0)
      val toks = TextFunctions.tokens(col("text"))
      val n = size(toks).cast("double")
      val punct = TextFunctions.punctCount(col("text")).cast("double")
      val stops = TextFunctions.stopwordCount(col("text"), TextFunctions.EnglishStopwords)
        .cast("double")
      val punctRatio = punct / length(col("text")).cast("double")
      docs.select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        round(length(regexp_replace(col("text"), "\\s", "")).cast("double") / n, 4)
          .as("avg_tok_len"),
        round(punctRatio, 4).as("punct_ratio"),
        round(stops / n, 4).as("stop_ratio"),
        round(least(lit(1.0), n / 100.0) * (lit(1.0) - punctRatio), 4).as("quality"))
        .orderBy("doc_id")
    }),

    // t03: token counting — whitespace vs BPE-ish regex tokenizer.
    "t03_token_count" -> ((s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          size(TextFunctions.tokens(col("text"))).cast("long").as("ws_tokens"),
          TextFunctions.regexTokenCount(col("text")).as("re_tokens"),
          length(col("text")).cast("long").as("n_chars_actual"))
        .orderBy("doc_id")),

    // t18: HEAVY HITTERS — approximate top-k tokens through the native
    // Misra–Gries aggregate ([[graft.functions.HeavyHittersAgg]]). The
    // exact form (q22/t05's groupBy-count) shuffles one row per
    // DISTINCT token — vocabulary-sized, unbounded over web text; the
    // sketch ships at most `capacity` counters per partition and
    // merges them associatively, the fixed-memory pass a 100 TB token
    // audit runs. Counts never overcount and undercount by ≤
    // n/capacity; with capacity ≥ the fixture vocabulary (31 distinct)
    // no decrement fires, every count is exact, and the driver
    // hash-gates against the exact DuckDB top-k (same contract shape
    // as d03's SimHashAgg: a native aggregate whose fixture behavior
    // is deterministic). HeavyHittersSpec pins the approximation
    // guarantees at sub-vocabulary capacities.
    "t18_heavy_hitters" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("__toks", TextFunctions.tokens(col("text")))
        .select(explode_outer(col("__toks")).as("tok"))
        .filter(col("tok").isNotNull)
        .agg(graft.functions.HeavyHittersAgg.heavy_hitters(col("tok"), 64).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.token").as("token"), col("e.cnt").as("cnt"))
        .orderBy(desc("cnt"), col("token"))
        .limit(10)),

    // t19: KMV DISTINCT SKETCH + SET OPERATIONS — cross-corpus overlap
    // via mergeable synopses ([[graft.functions.KmvAgg]], the
    // theta-sketch surface): per-source sketches of the distinct-token
    // hash space, then UNION (k-smallest-of-union) and INTERSECTION
    // (Jaccard from the union sketch × union estimate) computed with
    // plain array expressions over the two k-arrays. The 100 TB story:
    // "how many distinct tokens do two crawls share" without a
    // distinct-key shuffle of either side — each group ships ≤k longs
    // per partial, and the set algebra is driver-trivial. Estimates
    // are (k−1)·2⁶⁰/kth-hash, EXACT whenever distinct ≤ k (sketch =
    // set). Hash-gated against DuckDB replaying the same md5-prefix
    // hash — deterministic because k-smallest-of-distinct is a pure
    // function of the input set, no RNG, no merge-order dependence;
    // accuracy on an over-capacity universe is pinned in KmvSpec.
    "t19_kmv_distinct_ops" -> ((s, d) => {
      val k = 256
      // 3-shingles, not tokens: the fixture vocabulary is ~31 words
      // (every sketch would sit in the exact branch); the ~2.7k
      // distinct shingles push all three sketches past k so the
      // ESTIMATOR is what the gate checks, with a non-trivial overlap
      val hashes = Dedup.withShingleArray(
          Tables.documents(s, d).filter(col("source").isin("src1", "src2"))
            .select(col("source"), col("doc_id"), col("text")),
          "text", 3, "sh")
        .select(col("source"), explode_outer(col("sh")).as("s3"))
        .filter(col("s3").isNotNull)
        .select(col("source"),
          conv(substring(md5(col("s3")), 1, 15), 16, 10).cast("long").as("h"))
      val sk = hashes.groupBy("source")
        .agg(graft.functions.KmvAgg.kmv_sketch(col("h"), k).as("sk"))
      def est(a: Column): Column =
        when(size(a) < k, size(a).cast("double"))
          .otherwise(lit(255.0) * lit(1.152921504606846976e18) /
            element_at(a, size(a)).cast("double"))
      val pair = sk.filter(col("source") === "src1").select(col("sk").as("ska"))
        .crossJoin(sk.filter(col("source") === "src2").select(col("sk").as("skb")))
        .withColumn("sku",
          slice(array_sort(array_union(col("ska"), col("skb"))), 1, k))
        .withColumn("c",
          size(array_intersect(array_intersect(col("sku"), col("ska")),
            col("skb"))))
      pair.select(explode(map(
          lit("distinct_src1"), round(est(col("ska")), 1),
          lit("distinct_src2"), round(est(col("skb")), 1),
          lit("union"), round(est(col("sku")), 1),
          lit("intersect"),
          round(est(col("sku")) * col("c").cast("double") /
            size(col("sku")).cast("double"), 1)))
          .as(Seq("stat", "est")))
        .orderBy("stat")
    }),

    // t20: BPE MERGE TRAINING ([[graft.text.Bpe]]) — learn a subword
    // vocabulary from the corpus, the tokenizer-training pass an LLM
    // data pipeline runs before token counting. One corpus-sized
    // groupBy builds the distinct word-frequency table; every merge
    // round after that is vocabulary-sized (pair explode → weighted
    // count → argmax → rewrite), so training cost is O(vocab × rounds)
    // no matter how large the corpus. Deterministic (count-desc,
    // pair-asc ties; leftmost non-overlapping application) but
    // rows-only at the driver: replaying ITERATIVE leftmost merges in
    // one SQL statement isn't reasonably expressible in the oracle
    // dialect — exact toy-corpus merges and repartition-invariance are
    // pinned in BpeSpec instead.
    "t20_bpe_train" -> ((s, d) => {
      val words = graft.text.Bpe.wordTable(
        Tables.documents(s, d).filter(length(col("text")) > 0), "text")
      graft.text.Bpe.train(s, words, n = 12).orderBy("rank")
    }),

    // t21: BPE TOKENIZATION + TOKEN ACCOUNTING — the serving half of
    // t20: apply the trained merges to the corpus and account tokens
    // per source (the packing/pricing input every LLM pipeline
    // computes after tokenizer training). Tokenization runs on the
    // DISTINCT-WORD vocabulary (merging never changes a word's
    // concatenation, so the merged symbol sequence still keys back to
    // its word) and joins back to per-source word usage — cost is
    // O(distinct words × merges) + one keyed usage aggregation, never
    // O(corpus tokens × merges), at any corpus size. Merge training
    // is not oracle-expressible (t20's reasoning) → rows-only; the
    // accounting arithmetic is pinned on a hand-computed toy corpus in
    // BpeSpec.
    "t21_bpe_tokenize" -> ((s, d) => {
      import graft.text.Bpe
      val docs = Tables.documents(s, d).filter(length(col("text")) > 0)
      // ONE corpus pass: the per-source usage is pinned (eager
      // localCheckpoint — Catalyst would otherwise re-run the
      // corpus-sized explode+aggregate subtree for each consumer) and
      // the vocabulary derives from the reduced counts
      val usage = docs.select(col("source"),
          explode(graft.text.TextFunctions.tokens(col("text"))).as("word"))
        .groupBy("source", "word").agg(count(lit(1)).as("n_uses"))
        .localCheckpoint(true)
      val vocab = Bpe.wordTableOf(
        usage.groupBy("word").agg(sum("n_uses").as("freq")), "word", "freq")
      // the trained merge list is t20's measured operator and is
      // deterministic per corpus — memoized per JVM so this gate
      // measures the SERVING half (apply + accounting), not a retrain
      val merges = PipelineQueries.VtFixtures
        .memoVal[Seq[(String, String)]]("bpe_merges", d) {
        Bpe.train(s, vocab, n = 12).orderBy("rank")
          .collect().map(r => (r.getString(1), r.getString(2))).toSeq
      }
      val wordTokens = Bpe.applyMerges(vocab, merges)
        .select(array_join(col("syms"), "").as("word"),
          size(col("syms")).as("n_tokens"))
      usage.join(wordTokens, "word")
        .groupBy("source")
        .agg(sum(col("n_uses")).as("n_words"),
          sum(col("n_uses") * col("n_tokens")).as("n_tokens"),
          round(sum(col("n_uses") * col("n_tokens")) / sum(col("n_uses")), 4)
            .as("tokens_per_word"))
        .orderBy("source")
    }),

    // t05: word bigram extraction — the n-gram operator as a public
    // query (d04 uses the same shingling internally at n=3).
    "t05_bigrams" -> ((s, d) => {
      val docs = Tables.documents(s, d).filter(col("lang") === "en")
        .select(col("doc_id"), col("text"))
      Dedup.withShingleArray(docs, "text", 2, "bg")
        .select(col("doc_id"), explode_outer(col("bg")).as("bigram"))
        .filter(col("bigram").isNotNull)
        .groupBy("bigram").agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), col("bigram"))
        .limit(15)
    }),

    // t13: encoding-quality gate — mojibake detection, the Unicode
    // cleanliness pass every web-scraped corpus needs: U+FFFD
    // replacement chars (decoder gave up) and the UTF-8-read-as-Latin-1
    // digraph signature ("Ã©") are counted and stripped, whitespace
    // re-collapsed. Artifacts are INJECTED into every 3rd doc (t09's
    // lesson: an unexercised detector gate proves nothing — oracle and
    // engine would agree by both missing it).
    "t13_encoding_quality" -> ((s, d) => {
      val docs = Tables.documents(s, d).filter(col("doc_id") < 200)
      val dirty = concat(col("text"),
        when(col("doc_id") % 3 === 0, lit(" � broken Ã© bytes �"))
          .otherwise(lit(" ok")))
      docs.select(col("doc_id"), dirty.as("dirty"))
        .select(col("doc_id"),
          (length(col("dirty")) - length(translate(col("dirty"), "�", "")))
            .cast("long").as("n_fffd"),
          ((length(col("dirty")) -
            length(regexp_replace(col("dirty"), "Ã©", ""))) / 2)
            .cast("long").as("n_moji"),
          // Strip sequentially in the ORACLE's order (U+FFFD first, then
          // the digraph): a single alternation pass diverges when removing
          // a U+FFFD creates a new "Ã©" adjacency the oracle's second pass
          // would catch — match by construction, not fixture luck.
          length(regexp_replace(
            regexp_replace(regexp_replace(col("dirty"), "�", ""), "Ã©", ""),
            "\\s+", " "))
            .cast("long").as("clean_len"))
        .orderBy("doc_id")
    }),

    // t14: character-entropy quality gate — low-entropy text (repeated
    // chars, boilerplate padding, binary-ish junk) is a standard
    // curation reject signal orthogonal to t02's ratio score and t08's
    // n-gram repetition. Shannon entropy over the per-doc character
    // distribution in the closed form H = ln(n) − (Σ c·ln c)/n, so one
    // two-level aggregation computes it — no per-doc probability
    // normalization pass. Restricted to ASCII-printable by construction
    // on BOTH sides: Spark's split("") yields UTF-16 code units while
    // DuckDB splits codepoints, so non-ASCII would diverge on surrogate
    // pairs, not on semantics. Shuffle volume = distinct (doc, char)
    // pairs ≤ 95·docs — far below token volume at any scale.
    "t14_char_entropy" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          regexp_replace(col("text"), "[^ -~]", "").as("txt"))
        .filter(length(col("txt")) > 0)
      val chars = docs
        .select(col("doc_id"), col("source"),
          explode_outer(split(col("txt"), "")).as("ch"))
        .filter(col("ch").isNotNull && col("ch") =!= "")
      val freq = chars.groupBy("doc_id", "source", "ch")
        .agg(count(lit(1)).cast("double").as("c"))
      val ent = freq.groupBy("doc_id", "source")
        .agg(round(log(sum(col("c"))) -
          sum(col("c") * log(col("c"))) / sum(col("c")), 4).as("h"))
      ent.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          // t11's lesson: round BEFORE the long cast (Spark truncates,
          // DuckDB rounds).
          sum(round(col("h") * 10000, 0).cast("long")).cast("long").as("h_e4_sum"),
          min("h").as("min_h"), max("h").as("max_h"))
        .orderBy("source")
    }),

    // t16: Gopher-style rule battery (Rae et al. 2021, "Scaling
    // Language Models", table A1 — public heuristics) — the composite
    // document gate every pretraining corpus runs: word-count bounds,
    // mean-word-length band, stopword floor, and symbol-to-word ratio
    // ('#' and '...' density). Symbols are INJECTED into every 4th doc
    // (t09/t13's lesson: an unexercised rule proves nothing), and the
    // near-boundary docs exercise the ratio threshold both ways. All
    // stats derive from INTEGER token counts staged in one projection —
    // one scan, expression-only, no shuffle before the per-lang
    // aggregate; per-doc doubles are single IEEE divisions of two
    // integers, bitwise-reproducible in any engine.
    "t16_gopher_rules" -> ((s, d) => {
      val dirty = when(col("doc_id") % 4 === 0,
        concat(col("text"), lit(" ### ... ###"))).otherwise(col("text"))
      val toks = Tables.documents(s, d)
        .select(col("lang"), dirty.as("txt"))
        .select(col("lang"), col("txt"),
          array_remove(split(lower(col("txt")), "\\W+"), "").as("toks"))
      val staged = toks.select(
        col("lang"),
        size(col("toks")).cast("long").as("n"),
        aggregate(transform(col("toks"), t => length(t).cast("long")),
          lit(0L), (a, b) => a + b).as("chars"),
        size(filter(col("toks"),
          t => t.isin("the", "a", "of", "to", "and", "in"))).cast("long").as("stops"),
        (length(col("txt")) - length(translate(col("txt"), "#", "")))
          .cast("long").as("hashes"),
        ((length(col("txt")) -
          length(regexp_replace(col("txt"), "\\.\\.\\.", ""))) / 3)
          .cast("long").as("dots"))
      val mwl = col("chars").cast("double") / col("n")
      val pw = col("n").between(20, 80)
      val pm = mwl >= 3.8 && mwl <= 4.6
      val ps = col("stops") >= 2
      val py = (col("hashes") + col("dots")).cast("double") / col("n") < 0.1
      def cnt(c: org.apache.spark.sql.Column) =
        sum(when(c, 1L).otherwise(0L)).cast("long")
      staged.groupBy("lang")
        .agg(count(lit(1)).as("docs"),
          cnt(pw).as("pass_words"),
          cnt(pm).as("pass_mwl"),
          cnt(ps).as("pass_stop"),
          cnt(py).as("pass_symbol"),
          cnt(pw && pm && ps && py).as("pass_all"),
          sum(col("n")).cast("long").as("tok_sum"),
          sum(col("chars")).cast("long").as("tok_chars"))
        .orderBy("lang")
    }),

    // t12: bigram-LM scoring — the statistical-LM quality gate
    // (perplexity-proxy filtering, the CCNet/Gopher-style membership
    // test) with a corpus-trained model: each doc scores the mean
    // add-one-smoothed conditional surprisal of its distinct bigrams,
    // ln((df(w1 w2) + 1) / (df(w1) + V)). Three keyed shuffles (doc
    // bigrams, bigram df, first-word df) + a broadcast scalar vocab —
    // the same shape at any corpus size; model "training" IS the df
    // aggregation, no driver-side state.
    "t12_bigram_lm" -> ((s, d) => {
      val docs = Tables.documents(s, d).filter(length(col("text")) > 0)
      // the bigram table feeds THREE consumers (df12, df1, the final
      // per-doc join) — stage the compact per-doc arrays once so the
      // tokenize + 2-gram + distinct pipeline runs once, not three
      // times (guide §2.4; the t10/Dedup staging pattern)
      val docbg = Dedup.withShingleArray(docs.select("doc_id", "text"), "text", 2, "bg")
        .select(col("doc_id"), col("bg"))
        .localCheckpoint(true) // eager: Dedup.minHashNearDups note
      val bgs = docbg
        .select(col("doc_id"), explode_outer(col("bg")).as("bigram"))
        .filter(col("bigram").isNotNull)
        .withColumn("w1", substring_index(col("bigram"), " ", 1))
      val df12 = bgs.groupBy("bigram").agg(count(lit(1)).as("df12"))
      val df1 = bgs.select("doc_id", "w1").distinct()
        .groupBy("w1").agg(count(lit(1)).as("df1"))
      val vocab = docs
        .withColumn("__toks", TextFunctions.tokens(col("text")))
        .select(explode_outer(col("__toks")).as("tok"))
        .filter(col("tok").isNotNull)
        .agg(countDistinct(col("tok")).as("v"))
      bgs.join(df12, "bigram").join(df1, "w1").crossJoin(broadcast(vocab))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          round(avg(log((col("df12") + 1).cast("double") /
            (col("df1") + col("v")).cast("double"))), 4).as("avg_logp"))
        .orderBy("doc_id")
    }),

    // t06: TF-IDF — the canonical text-analytics composite: term
    // frequency per (doc, token), document frequency per token, idf =
    // ln(N/df), top-scoring term per doc. Two shuffles (doc-token agg,
    // token df) + a window for the per-doc argmax.
    "t06_tfidf" -> ((s, d) => {
      val docs = Tables.documents(s, d).filter(col("doc_id") < 50)
      val toks = docs.select(col("doc_id"),
        explode(TextFunctions.tokens(col("text"))).as("tok"))
      val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val df_ = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      val n = docs.select(countDistinct(col("doc_id")).as("n"))
      val scored = tf.join(df_, "tok").crossJoin(broadcast(n))
        .withColumn("tfidf", col("tf") * log(col("n").cast("double") / col("df")))
      val w = Window.partitionBy("doc_id").orderBy(desc("tfidf"), col("tok"))
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("tok").as("top_term"),
          round(col("tfidf"), 6).as("score"))
        .orderBy("doc_id")
    }),

    // q105: BM25 RANKED RETRIEVAL — the lexical twin of the vector kNN
    // surface (q20/e01): Okapi BM25 (k1=1.2, b=0.75, Lucene idf) over
    // the whitespace tokenization the rest of the text stack uses.
    // Shape: one doc-length pass, one tf pass restricted to the query
    // terms (a broadcast-sized relation from the first shuffle on), a
    // broadcast df/corpus-stats join, top-k by score. The scan feeding
    // tf is pre-filtered on the terms so the shuffle carries only
    // matching (doc, term) rows — at 100 TB the heavy side is the
    // doc-length pass, a map-side-combinable count. Determinism: each
    // term's contribution is pivoted to its OWN column and the final
    // score adds them in fixed term order — no float sum reordering —
    // so the DuckDB mirror is bit-identical (t06 precedent for ln/÷).
    "q105_bm25_search" -> ((s, d) => {
      val terms = Seq("dup", "spark", "data") // rare → common (df 25/385/395)
      val docs = Tables.documents(s, d).filter(length(col("text")) > 0)
      val toks = docs.select(col("doc_id"),
        explode(TextFunctions.tokens(col("text"))).as("tok"))
      val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      val stats = dl.agg(count(lit(1)).as("n"),
        (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
      val tf = toks.filter(col("tok").isin(terms: _*))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      val contrib = tf.join(broadcast(dfreq), "tok").join(dl, "doc_id")
        .crossJoin(broadcast(stats))
        .withColumn("c",
          log((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)) *
            (col("tf") * lit(2.2)) /
            (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
      val piv = contrib.groupBy("doc_id")
        .pivot("tok", terms).agg(first(col("c")))
      piv.select(col("doc_id"),
          round(terms.map(t => coalesce(col(s"`$t`"), lit(0.0)))
            .reduce(_ + _), 6).as("score"))
        .orderBy(desc("score"), col("doc_id"))
        .limit(10)
    }),

    // q108: SEARCH SNIPPETS (keyword-in-context) — the result-rendering
    // tail of the retrieval tier (q104 index → q105/q107 rank → THIS).
    // Pure expression pipeline: per-term hit counts from length deltas
    // (no regex, integer-exact), a window around the FIRST occurrence
    // of the first matching term, and bracket highlighting via
    // sequential replace — every step has the identical builtin in
    // DuckDB, so the snippet STRINGS hash-match, not just the ranks.
    // Expression-only scan → trivially scales; at 100 TB the scan feeds
    // from the token-index-pruned read (q104/q107), snippetting only
    // the pruned survivors.
    "q108_search_snippets" -> ((s, d) => {
      val terms = Seq("dup", "spark") // must mirror the oracle's list
      val docs = Tables.documents(s, d).filter(length(col("text")) > 0)
      val hits = terms.map(t =>
        ((length(col("text")) - length(call_function("replace", col("text"),
          lit(t), lit("")))) / lit(t.length)).cast("long")).reduce(_ + _)
      val firstPos = terms.map(t =>
        when(instr(col("text"), t) > 0, instr(col("text"), t)))
        .reduce((a, b) => least(coalesce(a, b), coalesce(b, a)))
      val snip0 = col("text").substr(
        greatest(lit(1), firstPos - lit(20)).cast("int"), lit(60))
      docs.select(col("doc_id"), hits.as("hits"),
          terms.foldLeft(snip0) { (c, t) =>
            call_function("replace", c, lit(t), lit(s"[$t]"))
          }.as("snippet"))
        .filter(col("hits") > 0)
        .orderBy(desc("hits"), col("doc_id"))
        .limit(15)
    }),

    // t07: the LLM training-data CURATION composite — the flow this
    // engine exists for, as one DAG: language slice → quality gate
    // (t02's score) → exact dedup (keep min doc_id per text) → corpus
    // stats. Each stage is the already-oracle-checked operator; the
    // composite proves they chain.
    "t07_curation_pipeline" -> ((s, d) => {
      val docs = Tables.documents(s, d).filter(length(col("text")) > 0)
      val toks = TextFunctions.tokens(col("text"))
      val n = size(toks).cast("double")
      val punctRatio = TextFunctions.punctCount(col("text")).cast("double") /
        length(col("text")).cast("double")
      val scored = docs.select(col("doc_id"), col("lang"), col("text"),
        size(toks).cast("long").as("n_tokens"),
        round(least(lit(1.0), n / 100.0) * (lit(1.0) - punctRatio), 4).as("quality"))
      val gated = scored.filter(col("lang") === "en" && col("quality") >= 0.3)
      val deduped = gated.groupBy(col("text"))
        .agg(min(col("doc_id")).as("doc_id"), first(col("n_tokens")).as("n_tokens"),
          first(col("quality")).as("quality"))
      deduped.agg(
        count(lit(1)).as("docs_kept"),
        sum("n_tokens").as("tokens_total"),
        round(avg("quality"), 4).as("avg_quality"))
    }),

    // t08: intra-document REPETITION scoring (Gopher-style quality
    // rule): fraction of word 3-grams that are repeats of an earlier
    // 3-gram in the same doc. Pure per-row array expressions — the
    // repetition ratio never leaves the row, so this is a narrow scan.
    "t08_repetition" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val staged = Dedup.withShingleArray(
        docs.select(col("doc_id"), col("text")), "text", 3, "shd")
        .withColumn("toks", TextFunctions.tokens(col("text")))
        .withColumn("total",
          greatest(size(col("toks")) - 2, lit(0)).cast("long"))
      staged
        .filter(col("total") > 0)
        .select(col("doc_id"), col("total"),
          size(col("shd")).cast("long").as("distinct_3g"))
        .withColumn("rep_ratio",
          round(lit(1.0) - col("distinct_3g").cast("double") / col("total"), 4))
        .select("doc_id", "total", "distinct_3g", "rep_ratio")
        .orderBy(desc("rep_ratio"), col("doc_id"))
        .limit(25)
    }),

    // t09: PII REDACTION — the fixture has no PII, so deterministic
    // synthetic contact lines (email + phone + IP derived from doc_id)
    // are appended in-plan, then scrubbed by the redaction transform;
    // the oracle applies the same injection + equivalent regexes, so
    // the scrub itself is what's verified.
    "t09_pii_redaction" -> ((s, d) => {
      val docs = Tables.documents(s, d).filter(col("doc_id") < 100)
      val withPii = docs.select(col("doc_id"),
        concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@example.test"),
          // 3-3-4 shape, same as PhonePattern — an injected shape the
          // pattern can never match (e.g. 3-4-4) would leave the phone
          // class unexercised: oracle and engine would agree by BOTH
          // missing it.
          lit(" or 555-"), lpad(pmod(col("doc_id"), lit(1000)).cast("string"), 3, "0"),
          lit("-"), lpad(pmod(col("doc_id") * 7, lit(10000)).cast("string"), 4, "0"),
          lit(" ip 10.0."), pmod(col("doc_id"), lit(256)).cast("string"), lit(".1"))
          .as("dirty"))
      withPii.select(col("doc_id"),
        length(col("dirty")).cast("long").as("dirty_len"),
        length(TextFunctions.redactPii(col("dirty"))).cast("long").as("clean_len"),
        (size(split(TextFunctions.redactPii(col("dirty")), "\\[REDACTED\\]", -1)) - 1)
          .cast("long").as("redactions"))
        .orderBy("doc_id")
    }),

    // q51: SEMANTIC CHUNKER, oracle-gated end-to-end — the reference's
    // distinctive R2 rule (LangChain SemanticChunker percentile
    // breakpoints, /root/reference/jobs/embedder.py:31-41) run as
    // Chunkers.semantic over the deterministic md5 hash embedder
    // (HashEmbed.embedLocal). The oracle replays the whole rule in SQL:
    // sentence split, per-sentence embedding, consecutive cosine
    // distances, nearest-rank 95th-percentile threshold, breakpoint
    // count. Every embedding component is an integer-valued double, so
    // distances agree bit-for-bit across engines; chunk char totals
    // follow from sum(sentence lens) + (n_sent - n_chunks) since chunks
    // rejoin sentences with single spaces.
    "q51_semantic_chunks" -> ((s, d) => {
      val chunksUdf = udf((t: String) =>
        Chunkers.semantic(t, graft.vector.HashEmbed.embedLocal(_), 95.0))
      val nSentUdf = udf((t: String) => Chunkers.sentences(t).size)
      Tables.documents(s, d)
        .filter(length(col("text")) > 0)
        .withColumn("chunks", chunksUdf(col("text")))
        .select(col("doc_id"),
          nSentUdf(col("text")).cast("long").as("n_sentences"),
          size(col("chunks")).cast("long").as("n_chunks"),
          aggregate(col("chunks"), lit(0L), (a, c) => a + length(c)).as("chunk_chars"))
        .orderBy("doc_id")
    }),

    // t10: BOILERPLATE DETECTION + strip scoring (the C4/RefinedWeb
    // cleaning step): word-3-gram shingles whose document frequency
    // within a source reaches 60% are boilerplate; each doc is scored by
    // the fraction of its shingles that are boilerplate. The fixture has
    // no boilerplate, so a deterministic per-source header is injected
    // in-plan (same pattern as t09's PII): the DETECTOR must then find
    // its pure-header shingles by frequency — header/text boundary
    // shingles differ per doc and stay below threshold, as does any
    // organic shingle. Integer threshold math (df*10 >= n_docs*6)
    // avoids float comparisons. One shuffle for df, one for the per-doc
    // score — both keyed on (source, shingle), the 100 TB shape.
    "t10_boilerplate" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("source"),
        concat(lit("subscribe to "), col("source"),
          lit(" newsletter for daily updates today "), col("text")).as("text2"))
      // The shingle table feeds THREE consumers (df counting, the
      // per-doc score join, and the boiler-shingle count) — without
      // staging, the physical plan ran the tokenize + 3-gram +
      // distinct pipeline over the corpus three times. Checkpoint the
      // COMPACT per-doc arrays once and explode per consumer
      // (guide §2.4; the Dedup.minHashNearDups staging pattern).
      val docsh = Dedup.withShingleArray(docs, "text2", 3, "shd")
        .select(col("doc_id"), col("source"), col("shd"))
        .localCheckpoint(true) // eager: Dedup.minHashNearDups note
      val sh = docsh
        .select(col("doc_id"), col("source"), explode_outer(col("shd")).as("sh"))
        .filter(col("sh").isNotNull)
      val srcN = Tables.documents(s, d).groupBy("source")
        .agg(count(lit(1)).as("n_docs"))
      val dfreq = sh.groupBy("source", "sh").agg(count(lit(1)).as("df"))
      // boiler is consumed twice (score join + shingle count) and is
      // header-shingles small — checkpoint so the df aggregation over
      // the corpus runs once.
      val boiler = dfreq.join(broadcast(srcN), "source")
        .filter(col("df") * 10 >= col("n_docs") * 6)
        .select(col("source"), col("sh"))
        .localCheckpoint(true) // eager: Dedup.minHashNearDups note
      val perDoc = sh
        .join(boiler.withColumn("isb", lit(1)), Seq("source", "sh"), "left")
        .groupBy("doc_id", "source")
        .agg(count(lit(1)).as("total"), count(col("isb")).as("bcnt"))
      perDoc.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          round(avg(col("bcnt").cast("double") / col("total")), 4)
            .as("avg_boiler_ratio"))
        .join(boiler.groupBy("source").agg(countDistinct("sh").as("bs")),
          Seq("source"), "left")
        .select(col("source"), col("n_docs"),
          coalesce(col("bs"), lit(0L)).as("boiler_shingles"),
          col("avg_boiler_ratio"))
        .orderBy("source")
    }),

    // t04: positional-weighted document fingerprint (rolling-hash style):
    // md5-token hashes weighted by position mod 31, summed mod 1e9+7.
    // Pure integer math → exact cross-engine agreement.
    // Tokenization STAGED before the generator (engineering note #2:
    // posexplode over an inline expression lets
    // InferFiltersFromGenerate synthesize a size()>0 pre-filter with
    // the tokenizer re-inlined — tokenizing every document twice);
    // posexplode_outer blocks the inference, the isNotNull filter
    // drops the empty-array null row it adds.
    "t04_fingerprint" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), TextFunctions.rawTokens(col("text")).as("toks"))
        .select(col("doc_id"),
          posexplode_outer(col("toks")).as(Seq("pos", "tok")))
        .filter(col("tok").isNotNull)
        .withColumn("th", Dedup.tokenHash(col("tok")))
        .groupBy("doc_id")
        .agg(pmod(sum(col("th") * (pmod(col("pos"), lit(31)) + 1)), lit(1000000007L))
          .as("fingerprint"))
        .orderBy("doc_id"))
  )

  private val toksCte =
    """WITH toks AS (
      |  SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS tok
      |  FROM documents)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q22_tokens" -> (toksCte.replace("FROM documents", "FROM documents WHERE lang = 'en'") +
      """
        |SELECT tok AS token, count(*) AS cnt FROM toks
        |GROUP BY tok ORDER BY cnt DESC, token LIMIT 10""".stripMargin),
    "q23_chunks" ->
      """SELECT doc_id, CAST(ceil(length(text) / 40.0) AS BIGINT) AS chunk_cnt
        |FROM documents WHERE length(text) > 0
        |ORDER BY doc_id LIMIT 20""".stripMargin,
    "t01_lang_id" -> (toksCte +
      """,
        |prof(p_lang, tok) AS (VALUES
        |  ('en','the'),('en','a'),('en','and'),('en','of'),('en','is'),
        |  ('es','el'),('es','la'),('es','de'),('es','que'),('es','y'),
        |  ('de','der'),('de','die'),('de','und'),('de','das'),('de','ist'),
        |  ('fr','le'),('fr','les'),('fr','des'),('fr','et'),('fr','est'),
        |  ('zh','de5'),('zh','shi4'),('zh','le5'),('zh','bu4'),('zh','zai4')),
        |sc AS (
        |  SELECT doc_id, p_lang, count(*) AS hits
        |  FROM toks JOIN prof USING (tok) GROUP BY 1, 2),
        |best AS (
        |  SELECT doc_id, p_lang, hits,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, p_lang) AS rn
        |  FROM sc)
        |SELECT d.doc_id, d.lang,
        |  coalesce(b.p_lang, 'und') AS pred_lang,
        |  CAST(coalesce(b.hits, 0) AS BIGINT) AS stop_hits
        |FROM documents d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin),
    "t02_quality" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS n,
        |    length(regexp_replace(text, '\s', '', 'g')) AS nonws,
        |    length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS punct,
        |    len(list_filter(string_split_regex(text, '\s+'),
        |      x -> list_contains(['the','a','and','of','is','in','to','it','that','for'], x)))
        |      AS stops,
        |    length(text) AS chars
        |  FROM documents WHERE length(text) > 0)
        |SELECT doc_id,
        |  CAST(n AS BIGINT) AS n_tokens,
        |  round(CAST(nonws AS DOUBLE) / n, 4) AS avg_tok_len,
        |  round(CAST(punct AS DOUBLE) / chars, 4) AS punct_ratio,
        |  round(CAST(stops AS DOUBLE) / n, 4) AS stop_ratio,
        |  round(least(CAST(1.0 AS DOUBLE), CAST(n AS DOUBLE) / 100) *
        |        (CAST(1.0 AS DOUBLE) - CAST(punct AS DOUBLE) / chars), 4) AS quality
        |FROM m ORDER BY doc_id""".stripMargin,
    "t03_token_count" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT)
        |    AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT)
        |    AS re_tokens,
        |  CAST(length(text) AS BIGINT) AS n_chars_actual
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t08_repetition" ->
      """WITH dt AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS L
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    CAST(greatest(len(L) - 2, 0) AS BIGINT) AS total,
        |    CAST(len(list_distinct(list_transform(range(len(L) - 2),
        |      i -> array_to_string(L[i + 1 : i + 3], ' ')))) AS BIGINT) AS distinct_3g
        |  FROM dt WHERE len(L) >= 3)
        |SELECT doc_id, total, distinct_3g,
        |  round(1.0 - distinct_3g::DOUBLE / total, 4) AS rep_ratio
        |FROM g ORDER BY rep_ratio DESC, doc_id LIMIT 25""".stripMargin,
    "t10_boilerplate" ->
      """WITH docs2 AS (
        |  SELECT doc_id, source,
        |    'subscribe to ' || source || ' newsletter for daily updates today ' || text
        |      AS text2
        |  FROM documents),
        |toks AS (
        |  SELECT doc_id, source, unnest(L) AS tok, unnest(range(len(L))) AS i
        |  FROM (SELECT doc_id, source,
        |          list_filter(string_split_regex(text2, '\s+'), x -> x <> '') AS L
        |        FROM docs2)),
        |shing AS (
        |  SELECT DISTINCT a.doc_id, a.source, a.tok || ' ' || b.tok || ' ' || c.tok AS sh
        |  FROM toks a
        |  JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
        |  JOIN toks c ON a.doc_id = c.doc_id AND c.i = a.i + 2),
        |srcn AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
        |dfreq AS (SELECT source, sh, count(*) AS df FROM shing GROUP BY 1, 2),
        |boiler AS (
        |  SELECT d.source, d.sh FROM dfreq d JOIN srcn USING (source)
        |  WHERE d.df * 10 >= srcn.n_docs * 6),
        |perdoc AS (
        |  SELECT s.doc_id, s.source, count(*) AS total, count(b.sh) AS bcnt
        |  FROM shing s
        |  LEFT JOIN boiler b ON s.source = b.source AND s.sh = b.sh
        |  GROUP BY 1, 2)
        |SELECT p.source, count(*) AS n_docs,
        |  CAST(coalesce(max(bs.c), 0) AS BIGINT) AS boiler_shingles,
        |  round(avg(CAST(bcnt AS DOUBLE) / total), 4) AS avg_boiler_ratio
        |FROM perdoc p
        |LEFT JOIN (SELECT source, count(DISTINCT sh) AS c FROM boiler GROUP BY 1) bs
        |  ON p.source = bs.source
        |GROUP BY p.source ORDER BY p.source""".stripMargin,
    // RE2 (DuckDB's regex engine) has no lookbehind, so the engine's
    // sentence split `(?<=[.!?])\s+` is emulated by rewriting the
    // boundary to a control-char marker and splitting on it — identical
    // pieces for any text without chr(1).
    "q51_semantic_chunks" ->
      """WITH docs AS (
        |  SELECT doc_id, list_filter(
        |      string_split(regexp_replace(text, '([.!?])\s+', '\1' || chr(1), 'g'), chr(1)),
        |      x -> x <> '') AS sl
        |  FROM documents WHERE length(text) > 0),
        |sent AS (
        |  SELECT doc_id, unnest(sl) AS s, unnest(range(len(sl))) AS pos FROM docs),
        |tok AS (
        |  SELECT doc_id, pos,
        |    unnest(list_filter(string_split_regex(lower(s), '\W+'), x -> x <> '')) AS t
        |  FROM sent),
        |comp AS (
        |  SELECT doc_id, pos, h % 64 AS idx,
        |    CAST(sum(CASE WHEN (h >> 16) % 2 = 0 THEN 1 ELSE -1 END) AS DOUBLE) AS v
        |  FROM (SELECT doc_id, pos, CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) AS h
        |        FROM tok)
        |  GROUP BY 1, 2, 3),
        |norm AS (
        |  SELECT s.doc_id, s.pos, coalesce(n.n, 0.0) AS n
        |  FROM sent s LEFT JOIN (
        |    SELECT doc_id, pos, sqrt(sum(v * v)) AS n FROM comp GROUP BY 1, 2) n
        |  USING (doc_id, pos)),
        |dt AS (
        |  SELECT a.doc_id, a.pos, sum(a.v * b.v) AS dp
        |  FROM comp a JOIN comp b
        |    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1 AND a.idx = b.idx
        |  GROUP BY 1, 2),
        |dist AS (
        |  SELECT n1.doc_id, n1.pos,
        |    CASE WHEN n1.n * n2.n = 0 THEN 1.0
        |         ELSE 1.0 - coalesce(d.dp, 0.0) / (n1.n * n2.n) END AS dist
        |  FROM norm n1 JOIN norm n2 ON n1.doc_id = n2.doc_id AND n2.pos = n1.pos + 1
        |  LEFT JOIN dt d ON d.doc_id = n1.doc_id AND d.pos = n1.pos),
        |thr AS (
        |  SELECT doc_id, dist AS t FROM (
        |    SELECT doc_id, dist,
        |      row_number() OVER (PARTITION BY doc_id ORDER BY dist) AS rk,
        |      count(*) OVER (PARTITION BY doc_id) AS n
        |    FROM dist)
        |  WHERE rk = least(n, greatest(1, CAST(ceil(0.95::DOUBLE * n) AS BIGINT)))),
        |stats AS (
        |  SELECT d.doc_id, count(CASE WHEN d.dist > t.t THEN 1 END) AS breaks
        |  FROM dist d JOIN thr t USING (doc_id) GROUP BY 1),
        |base AS (
        |  SELECT doc_id, len(sl) AS n_sent,
        |    coalesce(list_sum(list_transform(sl, x -> length(x))), 0) AS sent_chars
        |  FROM docs)
        |SELECT b.doc_id,
        |  CAST(b.n_sent AS BIGINT) AS n_sentences,
        |  CAST(CASE WHEN b.n_sent <= 1 THEN b.n_sent ELSE s.breaks + 1 END AS BIGINT)
        |    AS n_chunks,
        |  CAST(b.sent_chars + b.n_sent
        |       - (CASE WHEN b.n_sent <= 1 THEN b.n_sent ELSE s.breaks + 1 END) AS BIGINT)
        |    AS chunk_chars
        |FROM base b LEFT JOIN stats s USING (doc_id)
        |ORDER BY b.doc_id""".stripMargin,
    "t09_pii_redaction" ->
      """WITH dirty AS (
        |  SELECT doc_id,
        |    text || ' contact user' || doc_id || '@example.test or 555-' ||
        |    lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' ||
        |    lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0') ||
        |    ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1' AS d
        |  FROM documents WHERE doc_id < 100),
        |clean AS (
        |  SELECT doc_id, d,
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(d,
        |          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[REDACTED]', 'g'),
        |        '\b\d{3}-\d{3}-\d{4}\b', '[REDACTED]', 'g'),
        |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[REDACTED]', 'g') AS c
        |  FROM dirty)
        |SELECT doc_id,
        |  CAST(length(d) AS BIGINT) AS dirty_len,
        |  CAST(length(c) AS BIGINT) AS clean_len,
        |  CAST(len(string_split(c, '[REDACTED]')) - 1 AS BIGINT) AS redactions
        |FROM clean ORDER BY doc_id""".stripMargin,
    "t07_curation_pipeline" ->
      """WITH scored AS (
        |  SELECT doc_id, lang, text,
        |    len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS n_tokens,
        |    round(least(CAST(1.0 AS DOUBLE),
        |        len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) / 100.0) *
        |      (CAST(1.0 AS DOUBLE) -
        |        CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
        |          AS DOUBLE) / length(text)), 4) AS quality
        |  FROM documents WHERE length(text) > 0),
        |gated AS (SELECT * FROM scored WHERE lang = 'en' AND quality >= 0.3),
        |deduped AS (
        |  SELECT min(doc_id) AS doc_id, any_value(n_tokens) AS n_tokens,
        |    any_value(quality) AS quality
        |  FROM gated GROUP BY text)
        |SELECT count(*) AS docs_kept,
        |  CAST(sum(n_tokens) AS BIGINT) AS tokens_total,
        |  round(avg(quality), 4) AS avg_quality
        |FROM deduped""".stripMargin,
    "t13_encoding_quality" ->
      ("""WITH dirty AS (
        |  SELECT doc_id,
        |    text || (CASE WHEN doc_id % 3 = 0
        |      THEN ' """ + "� broken Ã© bytes �" + """'
        |      ELSE ' ok' END) AS d
        |  FROM documents WHERE doc_id < 200)
        |SELECT doc_id,
        |  CAST(length(d) - length(replace(d, chr(65533), '')) AS BIGINT) AS n_fffd,
        |  CAST((length(d) - length(replace(d, chr(195) || chr(169), ''))) / 2 AS BIGINT)
        |    AS n_moji,
        |  CAST(length(regexp_replace(
        |    replace(replace(d, chr(65533), ''), chr(195) || chr(169), ''),
        |    '\s+', ' ', 'g')) AS BIGINT) AS clean_len
        |FROM dirty ORDER BY doc_id""").stripMargin,
    "t14_char_entropy" ->
      """WITH ch AS (
        |  SELECT doc_id, source,
        |    unnest(string_split(regexp_replace(text, '[^ -~]', '', 'g'), '')) AS ch
        |  FROM documents WHERE length(regexp_replace(text, '[^ -~]', '', 'g')) > 0),
        |f AS (
        |  SELECT doc_id, source, ch, CAST(count(*) AS DOUBLE) AS c
        |  FROM ch WHERE ch <> '' GROUP BY doc_id, source, ch),
        |e AS (
        |  SELECT doc_id, source,
        |    round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 4) AS h
        |  FROM f GROUP BY doc_id, source)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CAST(round(h * 10000, 0) AS BIGINT)) AS BIGINT) AS h_e4_sum,
        |  min(h) AS min_h, max(h) AS max_h
        |FROM e GROUP BY source ORDER BY source""".stripMargin,
    // Same tokenizer as e01 (\W+ split of lowered text); list_sum on
    // the integer token lengths; replace() is global in DuckDB so the
    // '...' count needs no 'g' flag (Spark's regexp_replace is global).
    "t16_gopher_rules" ->
      """WITH t AS (
        |  SELECT lang,
        |    CASE WHEN doc_id % 4 = 0 THEN text || ' ### ... ###'
        |         ELSE text END AS txt
        |  FROM documents),
        |tok AS (
        |  SELECT lang, txt,
        |    list_filter(string_split_regex(lower(txt), '\W+'), x -> x <> '') AS toks
        |  FROM t),
        |m AS (
        |  SELECT lang,
        |    CAST(len(toks) AS BIGINT) AS n,
        |    CAST(coalesce(list_sum(list_transform(toks, x -> len(x))), 0) AS BIGINT) AS chars,
        |    CAST(len(list_filter(toks,
        |      x -> x IN ('the','a','of','to','and','in'))) AS BIGINT) AS stops,
        |    CAST(len(txt) - len(replace(txt, '#', '')) AS BIGINT) AS hashes,
        |    CAST((len(txt) - len(replace(txt, '...', ''))) / 3 AS BIGINT) AS dots
        |  FROM tok),
        |r AS (
        |  SELECT lang, n, chars,
        |    (n BETWEEN 20 AND 80) AS pw,
        |    (chars::DOUBLE / n >= 3.8 AND chars::DOUBLE / n <= 4.6) AS pm,
        |    (stops >= 2) AS ps,
        |    ((hashes + dots)::DOUBLE / n < 0.1) AS py
        |  FROM m)
        |SELECT lang, count(*) AS docs,
        |  CAST(sum(CASE WHEN pw THEN 1 ELSE 0 END) AS BIGINT) AS pass_words,
        |  CAST(sum(CASE WHEN pm THEN 1 ELSE 0 END) AS BIGINT) AS pass_mwl,
        |  CAST(sum(CASE WHEN ps THEN 1 ELSE 0 END) AS BIGINT) AS pass_stop,
        |  CAST(sum(CASE WHEN py THEN 1 ELSE 0 END) AS BIGINT) AS pass_symbol,
        |  CAST(sum(CASE WHEN pw AND pm AND ps AND py THEN 1 ELSE 0 END) AS BIGINT)
        |    AS pass_all,
        |  CAST(sum(n) AS BIGINT) AS tok_sum,
        |  CAST(sum(chars) AS BIGINT) AS tok_chars
        |FROM r GROUP BY lang ORDER BY lang""".stripMargin,
    "t12_bigram_lm" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(L) AS tok, unnest(range(len(L))) AS i
        |  FROM (SELECT doc_id,
        |          list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS L
        |        FROM documents WHERE length(text) > 0)),
        |bg AS (
        |  SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok AS bigram, a.tok AS w1
        |  FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1),
        |df12 AS (SELECT bigram, count(*) AS df12 FROM bg GROUP BY 1),
        |df1 AS (SELECT w1, count(*) AS df1
        |        FROM (SELECT DISTINCT doc_id, w1 FROM bg) GROUP BY 1),
        |voc AS (SELECT count(DISTINCT tok) AS v FROM toks)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  round(avg(ln(CAST(df12 + 1 AS DOUBLE) / CAST(df1 + v AS DOUBLE))), 4)
        |    AS avg_logp
        |FROM bg JOIN df12 USING (bigram) JOIN df1 USING (w1), voc
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // t18: exact top-k recompute — valid as the sketch's oracle because
    // capacity (64) exceeds the fixture vocabulary, where Misra–Gries
    // counts are exact by construction (no counter ever decrements).
    "t18_heavy_hitters" ->
      """SELECT tok AS token, count(*) AS cnt
        |FROM (SELECT unnest(list_filter(string_split_regex(text, '\s+'),
        |        x -> x <> '')) AS tok
        |      FROM documents)
        |GROUP BY tok ORDER BY cnt DESC, token LIMIT 10""".stripMargin,
    // DuckDB replays the sketch algebra exactly: k smallest distinct
    // md5-prefix hashes per source, k-smallest-of-union, Jaccard-scaled
    // intersection — deterministic, so hash-gated despite being a
    // sketch.
    "t19_kmv_distinct_ops" ->
      """WITH toks AS (
        |  SELECT source, doc_id, unnest(L) AS tok, unnest(range(len(L))) AS i
        |  FROM (SELECT source, doc_id,
        |          list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS L
        |        FROM documents WHERE source IN ('src1', 'src2'))),
        |sh AS (
        |  SELECT a.source, a.tok || ' ' || b.tok || ' ' || c.tok AS s3
        |  FROM toks a
        |  JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
        |  JOIN toks c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
        |tok AS (
        |  SELECT source, CAST(('0x' || substr(md5(s3), 1, 15)) AS BIGINT) AS h
        |  FROM sh),
        |dist AS (SELECT DISTINCT source, h FROM tok),
        |ka AS (SELECT h FROM dist WHERE source = 'src1' ORDER BY h LIMIT 256),
        |kb AS (SELECT h FROM dist WHERE source = 'src2' ORDER BY h LIMIT 256),
        |ku AS (SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb)
        |       ORDER BY h LIMIT 256),
        |ea AS (SELECT count(*) AS n, max(h) AS kth FROM ka),
        |eb AS (SELECT count(*) AS n, max(h) AS kth FROM kb),
        |eu AS (SELECT count(*) AS n, max(h) AS kth FROM ku),
        |ec AS (SELECT count(*) AS c FROM ku
        |       WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)),
        |est AS (
        |  SELECT
        |    CASE WHEN ea.n < 256 THEN ea.n::DOUBLE
        |         ELSE 255.0 * 1152921504606846976.0 / ea.kth END AS ea_v,
        |    CASE WHEN eb.n < 256 THEN eb.n::DOUBLE
        |         ELSE 255.0 * 1152921504606846976.0 / eb.kth END AS eb_v,
        |    CASE WHEN eu.n < 256 THEN eu.n::DOUBLE
        |         ELSE 255.0 * 1152921504606846976.0 / eu.kth END AS eu_v,
        |    ec.c AS c, eu.n AS kp
        |  FROM ea, eb, eu, ec)
        |SELECT stat, est FROM (
        |  SELECT 'distinct_src1' AS stat, round(ea_v, 1) AS est FROM est
        |  UNION ALL SELECT 'distinct_src2', round(eb_v, 1) FROM est
        |  UNION ALL SELECT 'union', round(eu_v, 1) FROM est
        |  UNION ALL SELECT 'intersect', round(eu_v * c / kp, 1) FROM est)
        |ORDER BY stat""".stripMargin,
    "t05_bigrams" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(L) AS tok, unnest(range(len(L))) AS i
        |  FROM (SELECT doc_id,
        |          list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS L
        |        FROM documents WHERE lang = 'en')),
        |bg AS (
        |  SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok AS bigram
        |  FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1)
        |SELECT bigram, count(*) AS cnt FROM bg
        |GROUP BY bigram ORDER BY cnt DESC, bigram LIMIT 15""".stripMargin,
    "q105_bm25_search" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS tok
        |  FROM documents WHERE length(text) > 0),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
        |stats AS (SELECT count(*) AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM dl),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks
        |       WHERE tok IN ('dup', 'spark', 'data') GROUP BY 1, 2),
        |dfq AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
        |contrib AS (
        |  SELECT tf.doc_id, tf.tok,
        |    ln((n - df + 0.5) / (df + 0.5) + 1.0) *
        |      (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) AS c
        |  FROM tf JOIN dfq USING (tok) JOIN dl USING (doc_id), stats),
        |piv AS (
        |  SELECT doc_id,
        |    max(CASE WHEN tok = 'dup' THEN c END) AS c1,
        |    max(CASE WHEN tok = 'spark' THEN c END) AS c2,
        |    max(CASE WHEN tok = 'data' THEN c END) AS c3
        |  FROM contrib GROUP BY 1)
        |SELECT doc_id,
        |  round(coalesce(c1, 0) + coalesce(c2, 0) + coalesce(c3, 0), 6) AS score
        |FROM piv ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,
    // Snippets: hit counts via length deltas, window at the first
    // occurrence of either term, bracket highlighting via the same
    // replace order the Spark plan applies.
    "q108_search_snippets" ->
      """WITH d AS (
        |  SELECT doc_id, text,
        |    CAST((length(text) - length(replace(text, 'dup', ''))) / 3 AS BIGINT)
        |      + CAST((length(text) - length(replace(text, 'spark', ''))) / 5 AS BIGINT)
        |      AS hits,
        |    least(
        |      coalesce(CASE WHEN instr(text, 'dup') > 0 THEN instr(text, 'dup') END,
        |               CASE WHEN instr(text, 'spark') > 0 THEN instr(text, 'spark') END),
        |      coalesce(CASE WHEN instr(text, 'spark') > 0 THEN instr(text, 'spark') END,
        |               CASE WHEN instr(text, 'dup') > 0 THEN instr(text, 'dup') END))
        |      AS fp
        |  FROM documents WHERE length(text) > 0)
        |SELECT doc_id, hits,
        |  replace(replace(substring(text, CAST(greatest(1, fp - 20) AS INT), 60),
        |    'dup', '[dup]'), 'spark', '[spark]') AS snippet
        |FROM d WHERE hits > 0
        |ORDER BY hits DESC, doc_id LIMIT 15""".stripMargin,
    "t06_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS tok
        |  FROM documents WHERE doc_id < 50),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(DISTINCT doc_id) AS n FROM documents WHERE doc_id < 50),
        |scored AS (
        |  SELECT tf.doc_id, tf.tok, tf.tf * ln(n.n::DOUBLE / df.df) AS tfidf
        |  FROM tf JOIN df USING (tok), n),
        |best AS (
        |  SELECT doc_id, tok, tfidf,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tok) AS rn
        |  FROM scored)
        |SELECT doc_id, tok AS top_term, round(tfidf, 6) AS score
        |FROM best WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "t04_fingerprint" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(text, '\s+')) AS tok,
        |    unnest(range(len(string_split_regex(text, '\s+')))) AS pos
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(sum(CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) * ((pos % 31) + 1))
        |       % 1000000007 AS BIGINT) AS fingerprint
        |FROM toks GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}
