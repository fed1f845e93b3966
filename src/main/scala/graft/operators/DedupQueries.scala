package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.{Clusters, Dedup}
import graft.sources.Tables

/** Deduplication queries over `documents`: exact (d01), MinHash+LSH
  * (d02), SimHash (d03), prefix-filtered n-gram Jaccard (d04),
  * pigeonhole-banded SimHash pairs (d05), connected-component cluster
  * formation (d06), benchmark decontamination — membership flag
  * (d07) and graded n-gram containment score (d09) — and incremental
  * MinHash against a persisted signature index (d11). The
  * embedding-cosine near-dup variant is q21 in [[VectorQueries]]. Every
  * hash is md5-prefix based so the DuckDB oracle reproduces signatures
  * exactly — the LSH candidate set itself (not just the verified
  * output) is cross-checked.
  */
object DedupQueries {
  type Q = (SparkSession, String) => DataFrame

  /** d11's persisted base-corpus signature index (arrays + bands +
    * verified pairs), memoized per (sf dir, JVM) and consumed
    * READ-ONLY: the incremental gate's input state, built once — the
    * MinhashSource pattern. */
  private object MhIndex {
    private val cache =
      new java.util.concurrent.ConcurrentHashMap[String, String]()

    def dir(s: SparkSession, d: String, docs: DataFrame): String =
      cache.computeIfAbsent(d, _ => {
        val idx = java.nio.file.Files.createDirectories(java.nio.file.Paths.get(
          "target", "pipeline",
          "mhidx_" + java.util.UUID.randomUUID().toString.replace("-", "").take(12))).toString
        Dedup.shingleArrays(docs.filter(pmod(col("doc_id"), lit(10L)) < 8),
            "doc_id", "text")
          .write.mode("overwrite").parquet(s"$idx/arrays")
        val storedArrays = s.read.parquet(s"$idx/arrays")
        Dedup.bandSignaturesOf(storedArrays).write.mode("overwrite")
          .parquet(s"$idx/bands")
        Dedup.jaccardVerifyArrays(
            Dedup.lshCandidates(s.read.parquet(s"$idx/bands")), storedArrays)
          .filter(col("jaccard") >= 0.5)
          .write.mode("overwrite").parquet(s"$idx/pairs")
        idx
      })
  }

  val queries: Map[String, Q] = Map(
    // d01: exact dedup via hash-groupBy on the full text (at scale:
    // groupBy(md5) — one shuffle of (hash, id), no text movement needed).
    "d01_dedup_exact" -> ((s, d) =>
      Dedup.exact(Tables.documents(s, d), "doc_id", "text")
        .orderBy("keep_id")),

    // d02: MinHash(12) + LSH(4 bands × 3 rows) near-dup pairs verified
    // with exact Jaccard ≥ 0.5 over 3-gram shingles.
    "d02_minhash_lsh" -> ((s, d) =>
      Dedup.minHashNearDups(Tables.documents(s, d), "doc_id", "text", threshold = 0.5)
        .select(col("da"), col("db"), round(col("jaccard"), 4).as("jac"))
        .orderBy("da", "db")),

    // d03: 60-bit SimHash per document.
    "d03_simhash" -> ((s, d) =>
      Dedup.simHash(Tables.documents(s, d), "doc_id", "text")
        .orderBy("id")),

    // d04: exact word-3-gram Jaccard near-dups, lang-blocked.
    "d04_ngram_jaccard" -> ((s, d) =>
      Dedup.ngramJaccardPairs(Tables.documents(s, d), "doc_id", "text", "lang",
          threshold = 0.5)
        .select(col("da"), col("db"), round(col("jaccard"), 4).as("jac"))
        .orderBy("da", "db")),

    // d05: SimHash near-dup pairs (hamming <= 6) via exact pigeonhole
    // banding — candidate generation is bucket equi-joins, verification
    // a popcount; the oracle recomputes the same pairs quadratically
    // (fine at oracle scale, which is the point of the banded design).
    "d05_simhash_neardup" -> ((s, d) =>
      Dedup.simHashNearDups(Tables.documents(s, d), "doc_id", "text", maxHamming = 6)
        .orderBy("da", "db")),

    // d07: dataset DECONTAMINATION — training docs that share any
    // 5-gram with a benchmark set (here: doc_id < 50) are flagged, the
    // canonical eval-leakage guard for LLM training data. Shape: the
    // benchmark shingle set is small → broadcast semi-join against the
    // corpus shingles; at 100 TB the corpus side streams through one
    // scan.
    "d07_decontamination" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val sh = Dedup.shingleSet(docs, "doc_id", "text", n = 5)
      val bench = sh.filter(col("id") < 50).select(col("sh")).distinct()
      sh.filter(col("id") >= 50)
        .join(broadcast(bench), "sh")
        .groupBy(col("id").as("doc_id"))
        .agg(count(lit(1)).as("hits"))
        .orderBy("doc_id")
    }),

    // d09: graded CONTAMINATION SCORE — d07 flags membership (shares
    // ANY 5-gram); curation pipelines also need the graded form: what
    // FRACTION of a training doc's distinct 5-grams appears in the
    // benchmark set (n-gram containment, the standard eval-overlap
    // measure — thresholds like "drop if >x% contaminated" need the
    // ratio, not the flag). Same scale shape as d07: the benchmark
    // shingle set is dim-sized → broadcast left join, corpus side
    // aggregates per doc through one shuffle; containment is an exact
    // ratio of two counts, engine-identical.
    "d09_contamination_score" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val sh = Dedup.shingleSet(docs, "doc_id", "text", n = 5)
      val bench = sh.filter(col("id") < 50).select(col("sh")).distinct()
      sh.filter(col("id") >= 50)
        .join(broadcast(bench.withColumn("__hit", lit(1))), Seq("sh"), "left")
        .groupBy(col("id").as("doc_id"))
        .agg(count(lit(1)).as("n_sh"), count(col("__hit")).as("hits"))
        .filter(col("hits") > 0)
        .select(col("doc_id"), col("n_sh"), col("hits"),
          round(col("hits") / col("n_sh"), 4).as("containment"))
        .orderBy("doc_id")
    }),

    // d10: passage-level exact-duplicate audit — the distributed form
    // of exact-substring training-data dedup (Lee et al., "Deduplicating
    // Training Data Makes Language Models Better"): slice each document
    // into non-overlapping 10-token passages, find passages repeated
    // across ≥2 distinct documents corpus-wide, and report each
    // source's duplicated-passage occurrence share. Passages come from
    // slice() over a STAGED token array (one projection, no HOF
    // re-evaluation; explode_outer dodges InferFiltersFromGenerate —
    // Dedup.scala's documented traps). Shape at 100 TB: two shuffles —
    // one groupBy(passage) for distinct-doc counts, one join back —
    // both keyed on the passage; production would key on
    // xxhash64(passage) so the shuffle moves 8-byte keys (the text
    // grouping here keeps the DuckDB oracle exact).
    "d10_passage_dedup" -> ((s, d) => {
      val chunks = Dedup.passageChunks(Tables.documents(s, d), Seq("source"))
      val dupTexts = Dedup.duplicatedPassages(chunks)
      chunks.join(dupTexts.withColumn("__dup", lit(1)), Seq("chunk"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_chunks"), count(col("__dup")).as("n_dup"))
        .withColumn("dup_pct_e4",
          round(col("n_dup") * 10000.0 / col("n_chunks"), 0).cast("long"))
        .orderBy("source")
    }),

    // d06: near-dup pairs → duplicate CLUSTERS via connected components
    // (min-label propagation); the oracle closes the same pair set with
    // a recursive CTE. Completes the dedup pipeline: pairs alone don't
    // dedup — groups with a representative do.
    "d06_dedup_clusters" -> ((s, d) => {
      val pairs = Dedup.minHashNearDups(Tables.documents(s, d), "doc_id", "text",
        threshold = 0.5)
      Clusters.connectedComponents(pairs, "da", "db")
        .orderBy("node")
    }),

    // d08: canonical document selection — the step that turns dedup
    // output into a curated corpus: every doc gets a cluster (its d06
    // component, or itself if it has no near-dup), then ONE survivor
    // per cluster by (quality desc, doc_id asc) using the t02 quality
    // score. Per-cluster argmax is a window rank over the cluster key —
    // one shuffle keyed by cluster; cluster sizes are near-dup
    // components, i.e. tiny, so no skew concern at scale.
    "d08_canonical_docs" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d).filter(length(col("text")) > 0)
      val toks = graft.text.TextFunctions.tokens(col("text"))
      val n = size(toks).cast("double")
      val punctRatio = graft.text.TextFunctions.punctCount(col("text")).cast("double") /
        length(col("text")).cast("double")
      val scored = docs.select(col("doc_id"),
        round(least(lit(1.0), n / 100.0) * (lit(1.0) - punctRatio), 4).as("q"))
      val pairs = Dedup.minHashNearDups(Tables.documents(s, d), "doc_id", "text",
        threshold = 0.5)
      val clusters = Clusters.connectedComponents(pairs, "da", "db")
      val withCluster = scored
        .join(clusters, scored("doc_id") === clusters("node"), "left")
        .select(col("doc_id"), coalesce(col("cluster"), col("doc_id")).as("cluster"),
          col("q"))
      val w = Window.partitionBy("cluster")
      withCluster
        .withColumn("r", row_number().over(
          Window.partitionBy("cluster").orderBy(desc("q"), col("doc_id"))))
        .withColumn("n_members", count(lit(1)).over(w))
        .filter(col("r") === 1)
        .select(col("cluster"), col("doc_id").as("keep_id"),
          col("n_members"), col("q").as("keep_quality"))
        .orderBy("cluster")
    }),

    // d11: INCREMENTAL MinHash-LSH against a PERSISTED signature index
    // — the batch counterpart of st21's streaming dedup. The base
    // corpus (doc_id % 10 < 8) is signed ONCE and its per-doc shingle
    // arrays, band signatures, and verified pairs land in a parquet
    // index; the increment (% 10 >= 8) then shingles ONLY its own
    // docs, bucket-joins its bands against the accumulated index,
    // verifies candidates against stored arrays, and unions the FROZEN
    // base pairs. Exactness rests on bands being per-doc (a doc's
    // signature never changes when other docs arrive), so old-old
    // pairs are precisely the persisted set and the union is
    // bit-identical to d02 rerun over the full corpus — gated by d02's
    // own oracle algebra. At 100 TB this is the difference between
    // re-shingling the corpus every ingest and touching
    // increment-sized data: per-increment cost = O(new docs + bucket
    // collisions), and the index grows by append.
    "d11_incremental_minhash" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      // build time (base corpus): sign once, persist arrays + bands +
      // pairs. "The base corpus is signed ONCE and its ... arrays,
      // band signatures, and verified pairs land in a parquet index"
      // IS the declared semantic, so the index is a memoized READ-ONLY
      // fixture (one build per sf dir per JVM — the MinhashSource /
      // replayDir pattern); measured: the increment's shingle pass,
      // bucket join against the accumulated index, verify, and union.
      val idx = MhIndex.dir(s, d, docs)
      // ingest time (increment): shingle ONLY the new docs
      // EAGER localCheckpoint (the repo's only lazy ones lived here):
      // a lazily-marked RDD whose first materialization lands on a
      // broadcast-exchange thread can deadlock against the DAG
      // scheduler's cache-locs walk (RDDCheckpointData's GLOBAL lock
      // vs the RDD monitor, locked in opposite orders — observed as a
      // full-suite hang); eager materialization completes before any
      // concurrent consumer can race it
      val docshI = Dedup.shingleArrays(
          docs.filter(pmod(col("doc_id"), lit(10L)) >= 8), "doc_id", "text")
        .localCheckpoint(true)
      val bandsI = Dedup.bandSignaturesOf(docshI).localCheckpoint(true)
      val cands = Dedup.lshCandidatesIncremental(
        bandsI, s.read.parquet(s"$idx/bands").unionByName(bandsI))
      val newPairs = Dedup.jaccardVerifyArrays(
          cands, s.read.parquet(s"$idx/arrays").unionByName(docshI))
        .filter(col("jaccard") >= 0.5)
      s.read.parquet(s"$idx/pairs").unionByName(newPairs)
        .select(col("da"), col("db"), round(col("jaccard"), 4).as("jac"))
        .orderBy("da", "db")
    }),

    // d12: SEMANTIC DEDUPLICATION (the SemDeDup recipe, Abbas et al.
    // 2023, arXiv:2303.09540): k-means clusters the embedding space,
    // exact cosine runs ONLY within clusters, and each ε-ball keeps
    // its lowest-id representative (greedy keep-earliest — any doc
    // cosine-≥-τ to a lower id in its cluster drops). The clustering
    // IS the scale story, straight from the paper: pairwise work is
    // quadratic only in cluster size, and k grows with the corpus
    // (k=8 here mirrors the q110 gate; see the q112 comment for the
    // production-k argument). Reuses q110's deterministic k-means and
    // q21's exact-cosine algebra — one clustering, one pair formula,
    // three gates, zero drift.
    "d12_semantic_dedup" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      // assigned feeds THREE consumers (both pair-join sides via `v`
      // and the final per-cluster aggregation) — without staging the
      // k-means assignment pass and the embedding scan re-ran per
      // reference (guide §2.4; the Dedup staging pattern). Both frames
      // are corpus-row-sized with tiny payloads.
      val assigned = graft.vector.KMeans.assign(emb, k = 8, iters = 3)
        .select("vec_id", "cid")
        .localCheckpoint(true) // eager: Dedup.minHashNearDups note
      val v = emb.join(assigned, "vec_id")
        .select(col("vec_id"), col("cid"), col("embedding"))
        .localCheckpoint(true) // eager: Dedup.minHashNearDups note
      val dropped = v.as("a").join(v.as("b"),
          col("a.cid") === col("b.cid") &&
            col("a.vec_id") < col("b.vec_id"))
        .filter(graft.functions.vec_cosine_sim(
          col("a.embedding"), col("b.embedding")) >= 0.35)
        .select(col("b.vec_id").as("vec_id")).distinct()
        .withColumn("is_drop", lit(1))
      assigned.join(dropped, Seq("vec_id"), "left")
        .groupBy("cid")
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce(col("is_drop"), lit(0))).cast("long").as("n_dropped"),
          sum(when(col("is_drop").isNull, col("vec_id")))
            .cast("long").as("kept_id_sum"))
        .orderBy("cid")
    })
  )

  /** Shared shingle CTE: distinct word-3-gram shingles per doc. */
  private val shingleCte =
    """WITH toks AS (
      |  SELECT doc_id, lang, unnest(L) AS tok, unnest(range(len(L))) AS i
      |  FROM (SELECT doc_id, lang,
      |          list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS L
      |        FROM documents)),
      |shing AS (
      |  SELECT DISTINCT a.doc_id, a.lang, a.tok || ' ' || b.tok || ' ' || c.tok AS sh
      |  FROM toks a
      |  JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
      |  JOIN toks c ON c.doc_id = a.doc_id AND c.i = a.i + 2)""".stripMargin

  /** d02's verified-pair pipeline as a reusable CTE chain ending in
    * `pairs(da, db)`. */
  private val pairsCtes =
    """hx AS (
      |  SELECT doc_id, sh,
      |    CAST(('0x' || substr(md5(sh), 1, 8)) AS BIGINT) % 2147483647 AS x
      |  FROM shing),
      |params(i, a, c) AS (VALUES
      |  (0,1103,12345),(1,2357,98765),(2,4093,54321),(3,8191,13579),
      |  (4,16381,24680),(5,32749,11223),(6,65521,44556),(7,131071,77889),
      |  (8,262139,99001),(9,524287,22334),(10,1048573,55667),(11,2097143,88990)),
      |sig AS (
      |  SELECT doc_id, p.i, min((p.a * h.x + p.c) % 2147483647) AS mh
      |  FROM hx h CROSS JOIN params p GROUP BY 1, 2),
      |bands AS (
      |  SELECT doc_id, i // 3 AS band,
      |    string_agg(CAST(mh AS VARCHAR), '-' ORDER BY i) AS bsig
      |  FROM sig GROUP BY 1, 2),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
      |  FROM bands a JOIN bands b
      |    ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id),
      |sizes AS (SELECT doc_id, count(*) AS n FROM shing GROUP BY 1),
      |inter AS (
      |  SELECT c.da, c.db, count(*) AS ix
      |  FROM cand c
      |  JOIN shing x ON x.doc_id = c.da
      |  JOIN shing y ON y.doc_id = c.db AND y.sh = x.sh
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT da, db, round(CAST(ix AS DOUBLE) / (sa.n + sb.n - ix), 4) AS jac
      |  FROM inter
      |  JOIN sizes sa ON sa.doc_id = da
      |  JOIN sizes sb ON sb.doc_id = db
      |  WHERE CAST(ix AS DOUBLE) / (sa.n + sb.n - ix) >= 0.5)""".stripMargin

  /** d02's full verified-pair oracle — shared VERBATIM with d11: the
    * incremental form's gate is bit-identity with a full recompute. */
  private val minhashPairsOracle: String =
    shingleCte + ",\n" + pairsCtes + "\nSELECT da, db, jac FROM pairs ORDER BY da, db"

  val oracles: Map[String, String] = Map(
    "d10_passage_dedup" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS l
        |  FROM documents WHERE length(text) > 0),
        |t2 AS (SELECT * FROM t WHERE len(l) > 0),
        |toks AS (
        |  SELECT doc_id, source, unnest(l) AS tok, unnest(range(len(l))) AS i
        |  FROM t2),
        |ch AS (
        |  SELECT doc_id, source, i // 10 AS ci,
        |    string_agg(tok, ' ' ORDER BY i) AS chunk
        |  FROM toks GROUP BY 1, 2, 3),
        |dup AS (
        |  SELECT chunk FROM ch GROUP BY chunk
        |  HAVING count(DISTINCT doc_id) >= 2),
        |fin AS (
        |  SELECT source, count(*) AS n_chunks,
        |    CAST(sum(CASE WHEN chunk IN (SELECT chunk FROM dup)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
        |  FROM ch GROUP BY source)
        |SELECT source, n_chunks, n_dup,
        |  CAST(round(n_dup * 10000.0 / n_chunks, 0) AS BIGINT) AS dup_pct_e4
        |FROM fin ORDER BY source""".stripMargin,
    "d07_decontamination" ->
      """WITH dt AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS L
        |  FROM documents),
        |shing AS (
        |  SELECT DISTINCT doc_id, array_to_string(L[i + 1 : i + 5], ' ') AS sh
        |  FROM dt, unnest(range(len(L) - 4)) AS u(i)
        |  WHERE len(L) >= 5),
        |bench AS (SELECT DISTINCT sh FROM shing WHERE doc_id < 50)
        |SELECT s.doc_id, count(*) AS hits
        |FROM shing s JOIN bench b USING (sh)
        |WHERE s.doc_id >= 50
        |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,
    "d09_contamination_score" ->
      """WITH dt AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS L
        |  FROM documents),
        |shing AS (
        |  SELECT DISTINCT doc_id, array_to_string(L[i + 1 : i + 5], ' ') AS sh
        |  FROM dt, unnest(range(len(L) - 4)) AS u(i)
        |  WHERE len(L) >= 5),
        |bench AS (SELECT DISTINCT sh FROM shing WHERE doc_id < 50),
        |scored AS (
        |  SELECT s.doc_id, count(*) AS n_sh, count(b.sh) AS hits
        |  FROM shing s LEFT JOIN bench b ON s.sh = b.sh
        |  WHERE s.doc_id >= 50
        |  GROUP BY s.doc_id)
        |SELECT doc_id, n_sh, hits, round(hits / n_sh, 4) AS containment
        |FROM scored WHERE hits > 0 ORDER BY doc_id""".stripMargin,
    "d06_dedup_clusters" -> (
      "WITH RECURSIVE " + shingleCte.stripPrefix("WITH ") + ",\n" + pairsCtes +
      """,
        |sym AS (SELECT da AS u, db AS v FROM pairs
        |        UNION SELECT db, da FROM pairs),
        |reach(u, v) AS (
        |  SELECT u, v FROM sym
        |  UNION
        |  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u)
        |SELECT u AS node, least(u, min(v)) AS cluster
        |FROM reach GROUP BY u ORDER BY node""".stripMargin),
    "d08_canonical_docs" -> (
      "WITH RECURSIVE " + shingleCte.stripPrefix("WITH ") + ",\n" + pairsCtes +
      """,
        |sym AS (SELECT da AS u, db AS v FROM pairs
        |        UNION SELECT db, da FROM pairs),
        |reach(u, v) AS (
        |  SELECT u, v FROM sym
        |  UNION
        |  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
        |comp AS (
        |  SELECT u AS node, least(u, min(v)) AS cluster
        |  FROM reach GROUP BY u),
        |m AS (
        |  SELECT doc_id,
        |    round(least(CAST(1.0 AS DOUBLE),
        |      CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
        |        AS DOUBLE) / 100) *
        |      (CAST(1.0 AS DOUBLE) -
        |       CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
        |         AS DOUBLE) / length(text)), 4) AS q
        |  FROM documents WHERE length(text) > 0),
        |wc AS (
        |  SELECT m.doc_id, coalesce(c.cluster, m.doc_id) AS cluster, q
        |  FROM m LEFT JOIN comp c ON c.node = m.doc_id),
        |rk AS (
        |  SELECT doc_id, cluster, q,
        |    row_number() OVER (PARTITION BY cluster ORDER BY q DESC, doc_id) AS r,
        |    count(*) OVER (PARTITION BY cluster) AS n_members
        |  FROM wc)
        |SELECT cluster, doc_id AS keep_id, n_members, q AS keep_quality
        |FROM rk WHERE r = 1 ORDER BY cluster""".stripMargin),
    "d01_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS dup_cnt
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin,
    "d02_minhash_lsh" -> minhashPairsOracle,
    // d11's gate IS d02's: the incremental union must be bit-identical
    // to a full recompute over the same corpus
    "d11_incremental_minhash" -> minhashPairsOracle,
    // q110's k-means algebra (fin = final assignment) + q21's exact
    // pair formula, restricted to within-cluster pairs — SemDeDup.
    "d12_semantic_dedup" -> (VectorQueries.kmeansAssignCte +
      """,
        |ee AS (
        |  SELECT f.vec_id, f.cid, unnest(em.embedding)::DOUBLE AS v,
        |         unnest(range(len(em.embedding))) AS i
        |  FROM fin f JOIN embeddings em USING (vec_id)),
        |pp AS (
        |  SELECT a.vec_id AS va, b.vec_id AS vb,
        |         sum(a.v*b.v)/(sqrt(sum(a.v*a.v))*sqrt(sum(b.v*b.v))) AS cos
        |  FROM ee a JOIN ee b ON a.i = b.i AND a.cid = b.cid
        |    AND a.vec_id < b.vec_id
        |  GROUP BY 1, 2),
        |drp AS (SELECT DISTINCT vb AS vec_id FROM pp WHERE cos >= 0.35)
        |SELECT f.cid, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN dp.vec_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_dropped,
        |  CAST(sum(CASE WHEN dp.vec_id IS NULL THEN f.vec_id END)
        |    AS BIGINT) AS kept_id_sum
        |FROM fin f LEFT JOIN drp dp ON f.vec_id = dp.vec_id
        |GROUP BY f.cid ORDER BY f.cid""".stripMargin),
    "d03_simhash" ->
      """WITH toks AS (
        |  SELECT doc_id AS id,
        |    unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS tok
        |  FROM documents),
        |bits AS (
        |  SELECT id, j,
        |    sum(CASE WHEN (CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) >> j) % 2 = 1
        |        THEN 1 ELSE -1 END) AS vj
        |  FROM toks CROSS JOIN (SELECT unnest(range(60)) AS j) js
        |  GROUP BY 1, 2)
        |SELECT id, CAST(sum(CASE WHEN vj > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)
        |  AS BIGINT) AS simhash
        |FROM bits GROUP BY id ORDER BY id""".stripMargin,
    "d05_simhash_neardup" ->
      """WITH toks AS (
        |  SELECT doc_id AS id,
        |    unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS tok
        |  FROM documents),
        |bits AS (
        |  SELECT id, j,
        |    sum(CASE WHEN (CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) >> j) % 2 = 1
        |        THEN 1 ELSE -1 END) AS vj
        |  FROM toks CROSS JOIN (SELECT unnest(range(60)) AS j) js
        |  GROUP BY 1, 2),
        |h AS (
        |  SELECT id, CAST(sum(CASE WHEN vj > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)
        |    AS BIGINT) AS sh
        |  FROM bits GROUP BY id)
        |SELECT a.id AS da, b.id AS db,
        |  CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
        |FROM h a JOIN h b ON a.id < b.id
        |WHERE bit_count(xor(a.sh, b.sh)) <= 6
        |ORDER BY da, db""".stripMargin,
    "d04_ngram_jaccard" -> (shingleCte +
      """,
        |sizes AS (SELECT doc_id, count(*) AS cnt FROM shing GROUP BY 1),
        |inter AS (
        |  SELECT x.doc_id AS da, y.doc_id AS db, count(*) AS ix
        |  FROM shing x JOIN shing y
        |    ON x.sh = y.sh AND x.lang = y.lang AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2)
        |SELECT da, db, round(CAST(ix AS DOUBLE) / (sa.cnt + sb.cnt - ix), 4) AS jac
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = da
        |JOIN sizes sb ON sb.doc_id = db
        |WHERE CAST(ix AS DOUBLE) / (sa.cnt + sb.cnt - ix) >= 0.5
        |ORDER BY da, db""".stripMargin)
  )
}
