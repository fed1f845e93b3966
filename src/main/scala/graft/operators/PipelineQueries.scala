package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.{Bronze, Silver}
import graft.sources.{Branches, Lake, Repo, Tables, Versioned, VersionedScan}
import graft.text.{Chunkers, TextFunctions}

/** End-to-end pipeline queries: the reference's raw→bronze→silver flow
  * (p01) and chunk id/metadata generation (p02), both DuckDB-gated.
  *
  * The books fixture is derived DETERMINISTICALLY from `part` with pure
  * expressions, then round-tripped through a real JSON sink + scan
  * (S5/S1) and a partitioned parquet silver layer (S3) — so the oracle
  * can recompute the expected result straight from `part`, and the whole
  * ingest surface (schema inference, ragged records via omitted null
  * fields, rename-if-present, typed derivation, partitioned layout) is
  * exercised for real, not mocked.
  */
object PipelineQueries {
  type Q = (SparkSession, String) => DataFrame

  private def tmpDir(tag: String): String =
    Files.createDirectories(Paths.get("target", "pipeline",
      tag + "_" + java.util.UUID.randomUUID().toString.replace("-", "").take(12))).toString

  /** Memoized versioned-table fixtures for the DML gates, in two
    * consumption modes. The fixture — the commit history a gate's
    * operator runs AGAINST — is deterministic per sf dir, so it builds
    * once per (key, sf dir, JVM); the gate then times the OPERATOR
    * (cherry-pick, revert, vacuum, MoR delete, ...), not a re-run of
    * identical fixture commits. Same amortization contract as
    * [[OrdersMutations]] and the streaming replay dirs; at 100 TB nobody
    * rebuilds the table per query either.
    *
    *  - [[memo]]: the gate consumes the fixture READ-ONLY (time travel,
    *    CDC diff, history, point lookup). One shared dir.
    *  - [[freshCopy]]: the gate MUTATES the table. Per call the base is
    *    file-copied to a private dir — manifests reference data files
    *    RELATIVELY (Versioned.resolve), so a copied table is a valid
    *    table — and the mutation runs on the copy. The copy is a local
    *    recursive file copy, O(fixture bytes), zero Spark jobs.
    *
    * Builds must never create BRANCHES inside a freshCopy fixture: a
    * branch manifest references parent data files by ABSOLUTE URI
    * (Branches.create → Versioned.clone), which a file copy would leave
    * pointing at the base dir. Gates create branches per-run on the
    * copy instead (metadata-only, O(files) driver work). */
  private[operators] object VtFixtures {
    /** Build-once holder: computeIfAbsent installs only this (cheap)
      * holder under the map's bin lock; the multi-second Spark build
      * runs OUTSIDE it on first `value`, so concurrent builds of
      * unrelated keys never serialize on a hash-bin collision. A build
      * that throws leaves the lazy val uninitialized — the next caller
      * retries instead of inheriting a cached failure. */
    private final class Memo[T](f: => T) { lazy val value: T = f }

    private val bases =
      new java.util.concurrent.ConcurrentHashMap[(String, String), Memo[String]]()

    def memo(key: String, d: String)(build: String => Unit): String =
      bases.computeIfAbsent((key, d), _ => new Memo({
        val dir = tmpDir(s"fix_$key"); build(dir); dir
      })).value

    private val vals =
      new java.util.concurrent.ConcurrentHashMap[(String, String), Memo[Any]]()

    /** A deterministic fixture-derived VALUE (probe keys, bounds, ...),
      * computed once per (key, sf dir, JVM). */
    def memoVal[T](key: String, d: String)(f: => T): T =
      vals.computeIfAbsent((key, d), _ => new Memo[Any](f)).value.asInstanceOf[T]

    def freshCopy(key: String, d: String)(build: String => Unit): String = {
      val base = memo(key, d)(build)
      val dst = tmpDir(s"run_$key")
      copyTree(Paths.get(base), Paths.get(dst))
      dst
    }

    /** File-copy a fixture dir to an EXPLICIT destination — for SQL
      * catalog tables, whose identity IS their warehouse path (an
      * identifier resolves to `warehouse/name`, so a copied fixture
      * table dir is a valid table under the new name). */
    def copy(src: String, dst: String): Unit =
      copyTree(Paths.get(src), Paths.get(dst))

    private def copyTree(src: java.nio.file.Path,
        dst: java.nio.file.Path): Unit = {
      val stream = Files.walk(src)
      try stream.forEach { p =>
        val t = dst.resolve(src.relativize(p).toString)
        if (Files.isDirectory(p)) Files.createDirectories(t)
        else Files.copy(p, t,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      } finally stream.close()
    }
  }

  /** Shared fixture BUILDERS — one definition per memo key, passed at
    * every call site, so no gate can register a silently divergent
    * build for a key whose first-executed copy wins (memo ignores
    * every build lambda but the first). */
  private def buildBase3Col(s: SparkSession, d: String)(dir: String): Unit =
    Versioned.commit(s, dir, Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice")),
      Some("o_orderkey"))

  private def buildBase8Col(s: SparkSession, d: String)(dir: String): Unit =
    Versioned.commit(s, dir, Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice")),
      Some("o_orderkey"), files = 8)

  private def buildCents8(s: SparkSession, d: String)(dir: String): Unit =
    Versioned.commit(s, dir, Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents")),
      Some("o_orderkey"), files = 8)

  /** SQL fixture table names carry a per-JVM random suffix (the
    * warehouse dir is a STABLE path, so a deterministic name would
    * collide with a previous process's leftover fixture — the AnnRoots
    * fresh-per-JVM precedent) PLUS a per-sf-dir token: memoization is
    * per (key, sf dir, JVM), so two sf dirs served by one JVM must not
    * share one catalog table. */
  private lazy val jvmFixtureSuffix: String =
    java.util.UUID.randomUUID().toString.replace("-", "").take(10)
  private def sqlFixtureSuffix(d: String): String =
    jvmFixtureSuffix +
      java.lang.Integer.toHexString(d.hashCode).takeRight(4)

  /** The shared SQL-door DML fixture: a catalog table holding the
    * 3-column integer-cents orders snapshot (create = v1, insert = v2),
    * built ONCE per (sf dir, JVM) and file-copied to each gate's
    * per-run table (q130/q132/q133). */
  private def sqlCentsFixture(s: SparkSession, d: String,
      wh: String): String =
    VtFixtures.memoVal[String]("sql_cents3", d) {
      val ft = "fixc3_" + sqlFixtureSuffix(d)
      // a leftover under this (jvm, sf dir)-scoped name can only be
      // this JVM's own half-built fixture (the build threw after
      // CREATE); drop it so the retry starts clean
      s.sql(s"DROP TABLE IF EXISTS graft.$ft")
      s.sql(s"CREATE TABLE graft.$ft (o_orderkey BIGINT, " +
        "o_orderstatus STRING, cents BIGINT) " +
        "TBLPROPERTIES ('key' = 'o_orderkey')")
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
        .createOrReplaceTempView("sql_cents3_src")
      s.sql(s"INSERT INTO graft.$ft SELECT * FROM sql_cents3_src")
      s"$wh/$ft"
    }

  /** p07's crawl fixture: silver v1 = the even-id books, v2 = MERGE of
    * the odd-id books plus 2nd-edition title revisions of the %10 ids.
    * Built once per (sf dir, JVM), consumed read-only; everything the
    * gate measures (the embedding index and its change-feed refresh)
    * stays per-run. */
  private[operators] object IncRagSilver {
    private val tables =
      new java.util.concurrent.ConcurrentHashMap[String, String]()

    def table(s: SparkSession, d: String): String =
      tables.computeIfAbsent(d, _ => build(s, d))

    private def build(s: SparkSession, d: String): String = {
      val base = tmpDir("incrag_fix")
      val silverVt = s"$base/silver_vt"
      def silverFrom(raw: DataFrame, dir: String) = {
        Lake.writeJson(raw, dir)
        Silver.fromBronze(Bronze.fromRaw(Lake.readJson(s, dir)), runId = "inc")
      }
      val rawAll = rawBooks(s, d)
      val idL = col("id").cast("long")
      val silverA = silverFrom(rawAll.filter(idL % 2 === 0), s"$base/rawA")
      val silverB = silverFrom(
        rawAll.filter(idL % 2 === 1).unionByName(
          rawAll.filter(idL % 10 === 0).withColumn("title_xpath",
            concat(col("title_xpath"), lit(" (2nd ed.)")))),
        s"$base/rawB")
      Versioned.commit(s, silverVt, silverA, None, 4)
      Versioned.mergeCommit(s, silverVt, silverB, Seq("id"))
      silverVt
    }
  }

  /** The SHARED 3-version orders mutation fixture — v1 = the orders
    * snapshot keyed on o_orderkey, v2 = MERGE (updates: %7 keys
    * uplifted ×1.1; inserts: %13 keys halved under fresh +10M keys),
    * v3 = DELETE of the %11 keys. Eight operators consume exactly this
    * history READ-ONLY (q72 storage time travel over v1/v2, q74 change
    * feed, q83 incremental MV, q127 CDF format door, st16 manifest-tail
    * feed, st17 CDC replication source, st20 snapshot-then-tail feed,
    * st28 CDF-door stream), so it builds ONCE per (sf dir, JVM) and they
    * share it — the bench then times the operators, not five re-runs
    * of identical fixture commits. Memoized via computeIfAbsent:
    * atomic per key, so concurrent callers see one build. Consumers
    * must never mutate the table — anything write-shaped (replicas,
    * feeds, checkpoints) lands in the caller's own directory. */
  private[operators] object OrdersMutations {
    private val tables =
      new java.util.concurrent.ConcurrentHashMap[String, String]()

    /** Path of the fixture table for `d`, with versions 1..3 committed. */
    def table(s: SparkSession, d: String): String =
      tables.computeIfAbsent(d, _ => build(s, d))

    private def build(s: SparkSession, d: String): String = {
      val table = tmpDir("vt_mutfix")
      // cache(): the input feeds three eager commits (base, merge
      // source, tombstones) — one scan instead of four
      val orders = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .cache()
      try {
        Versioned.commit(s, table, orders, Some("o_orderkey"))
        val updates = orders.filter(col("o_orderkey") % 7 === 0)
          .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
            (col("o_totalprice") * 1.1).as("o_totalprice"))
        val inserts = orders.filter(col("o_orderkey") % 13 === 0)
          .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
            lit("N").as("o_orderstatus"),
            (col("o_totalprice") / 2).as("o_totalprice"))
        Versioned.mergeCommit(s, table, updates.unionByName(inserts),
          Seq("o_orderkey"))
        Versioned.deleteWhereKeyIn(s, table,
          orders.filter(col("o_orderkey") % 11 === 0).select("o_orderkey"),
          "o_orderkey")
        table
      } finally orders.unpersist(blocking = false)
    }
  }

  /** q115's two-table mutation fixture, memoized per (sf dir, JVM) —
    * READ-ONLY for consumers. Facts (from orders, keyed o_orderkey):
    * v1 base, v2 MERGE (%9 keys re-pointed to customer (custkey%500)+1
    * with cents+5000; %21 keys inserted under +20M keys at cents/4),
    * v3 DELETE of the %15 keys. Dimension (from customer, keyed
    * c_custkey): v1 base segments, v2 re-segments every %10 customer
    * to PROMO. */
  private[operators] object JoinMvFixture {
    private val cache =
      new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

    def tables(s: SparkSession, d: String): (String, String) =
      cache.computeIfAbsent(d, _ => build(s, d))

    private def build(s: SparkSession, d: String): (String, String) = {
      val ta = tmpDir("vt_ijv_facts")
      val tb = tmpDir("vt_ijv_dim")
      val a1base = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
        .cache()
      try {
        Versioned.commit(s, ta, a1base, Some("o_orderkey"))
        val updates = a1base.filter(col("o_orderkey") % 9 === 0)
          .select(col("o_orderkey"),
            (col("o_custkey") % 500 + 1).as("o_custkey"),
            (col("cents") + 5000L).as("cents"))
        val inserts = a1base.filter(col("o_orderkey") % 21 === 0)
          .select((col("o_orderkey") + 20000000L).as("o_orderkey"),
            col("o_custkey"), expr("cents div 4").as("cents"))
        Versioned.mergeCommit(s, ta, updates.unionByName(inserts),
          Seq("o_orderkey"))
        Versioned.deleteWhereKeyIn(s, ta,
          a1base.filter(col("o_orderkey") % 15 === 0).select("o_orderkey"),
          "o_orderkey")
        val b1base = Tables.customer(s, d).select(col("c_custkey"),
          col("c_mktsegment").as("segment"))
        Versioned.commit(s, tb, b1base, Some("c_custkey"))
        Versioned.mergeCommit(s, tb,
          b1base.filter(col("c_custkey") % 10 === 0)
            .select(col("c_custkey"), lit("PROMO").as("segment")),
          Seq("c_custkey"))
        (ta, tb)
      } finally a1base.unpersist(blocking = false)
    }
  }

  /** Books-shaped raw records from `part` (FIXTURES.md §1.1 contract):
    * price text with currency prefix, availability with parenthesized
    * count or "Out of stock" (p_size divisible by 7), description
    * omitted for every 5th part key (raggedness through the JSON sink —
    * Spark omits null fields per record). */
  def rawBooks(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).select(
      col("p_name").as("title_xpath"),
      concat(lit("£"), col("p_retailprice").cast("string")).as("price_xpath"),
      when(col("p_size") % 7 === 0, lit("Out of stock"))
        .otherwise(concat(lit("In stock ("), col("p_size").cast("string"), lit(" available)")))
        .as("availability_xpaths"),
      when(col("p_partkey") % 5 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("A "), col("p_type"), lit(" component.")))
        .as("description_xpaths"),
      col("p_brand").as("category_xpath"),
      (col("p_partkey") % 100).cast("string").as("review_count_xpath"),
      concat(lit("https://example.test/part/"), col("p_partkey").cast("string"))
        .as("book_url"),
      col("p_partkey").cast("string").as("id"),
      lit("2025-07-18 10:15:00").as("scraped_at"))

  /** The books-shaped raw JSON crawl dir, memoized per (sf dir, JVM):
    * deterministic and consumed read-only by the pipeline gates that
    * only SCAN it (p03); p01 keeps writing its own copy because the
    * JSON sink is part of what p01 gates. */
  private[operators] object RawBooksJson {
    private val dirs =
      new java.util.concurrent.ConcurrentHashMap[String, String]()

    def dir(s: SparkSession, d: String): String =
      dirs.computeIfAbsent(d, _ => {
        val p = tmpDir("rawjson")
        Lake.writeJson(rawBooks(s, d), p)
        p
      })
  }

  val queries: Map[String, Q] = Map(
    // p01: JSON sink → JSON scan (inferred, ragged) → bronze rename →
    // typed silver → category-partitioned parquet → read-back aggregate.
    "p01_pipeline_silver" -> ((s, d) => {
      val rawDir = tmpDir("raw")
      val silverDir = tmpDir("silver")
      Lake.writeJson(rawBooks(s, d), rawDir)
      val silver = Silver.fromBronze(Bronze.fromRaw(Lake.readJson(s, rawDir)), runId = "r2")
      Lake.writeParquetPartitioned(silver, silverDir, Seq("category"))
      Lake.readParquet(s, silverDir)
        .groupBy("category")
        .agg(
          count(lit(1)).as("n_books"),
          round(sum("price"), 2).as("total_price"),
          sum("quantity").cast("long").as("total_qty"),
          count(when(trim(col("stock_status")) === "In stock", 1)).as("in_stock"),
          count(col("description")).as("with_desc"))
        .orderBy("category")
    }),

    // p03: the WHOLE reference DAG through the composed runner
    // (graft.rag.BookPipeline): books JSON → bronze → silver → chunk
    // table with embeddings → kNN answer assembly. Runs under the
    // Md5Embedder (the oracle-checkable md5-prefix hash, raw
    // integer-valued components — exact L2 ranking across engines), so
    // the answer row is fully hash-gated: the oracle rebuilds document
    // assembly, 64-char chunking, per-chunk embedding, squared-L2
    // top-3 (ties on chunk_id) and the prompt-length arithmetic from
    // `part`. The pluggable-embedder path (JVM HashingEmbedder) stays
    // pinned in BookPipelineSpec.
    "p03_rag_pipeline" -> ((s, d) => {
      val base = tmpDir("rag")
      // the raw-JSON crawl dir is a deterministic READ-ONLY fixture —
      // memoized so reps time the pipeline (which re-reads it), not
      // the fixture write; the JSON-sink operator itself is p01's gate
      val r = graft.rag.BookPipeline.run(s, RawBooksJson.dir(s, d),
        s"$base/lake",
        question = "a small polished component",
        embedder = graft.vector.Md5Embedder(64))
      import s.implicits._
      Seq((r.question, r.fallbackUsed, r.source.getOrElse(""),
        r.bookCount, r.chunkCount, r.prompt.length.toLong))
        .toDF("question", "fallback_used", "source", "books", "chunks", "prompt_len")
    }),

    // p07: INCREMENTAL RAG INDEX MAINTENANCE on the versioned layer —
    // the reference's crawl→embed flow made TRANSACTIONAL and
    // incremental: crawl 1 lands as silver v1 and embeds everything
    // once; crawl 2 (new books + 2nd-edition title revisions) MERGEs
    // into silver v2, and the embedding index refreshes from the
    // CHANGE FEED — only docs the feed names re-chunk and re-embed
    // (`reembedded` pins the count), everything else carries from
    // index v1. At 100 TB this is the difference between embedding a
    // crawl delta and re-embedding the corpus per crawl. The gate
    // emits the kNN answer from BOTH the incrementally-maintained
    // index and a from-scratch rebuild of the final corpus under the
    // same oracle rows — incremental == rebuild == DuckDB's
    // re-derivation from `part` (p03's embedding algebra, revised
    // titles applied). No deletes in this fixture; deletion flows
    // through the same feed (q67/q74 gate that path).
    "p07_incremental_rag" -> ((s, d) => {
      // the 2-version silver table (crawl 1, then crawl 2's MERGE of
      // new books + revised titles) is deterministic per sf dir and
      // consumed READ-ONLY — memoized like OrdersMutations, so bench
      // reps time the incremental index maintenance, not the crawl
      // fixture's JSON round-trip and commits. The v1 embedding index
      // is the refresh's INPUT STATE — "crawl 1 embeds everything
      // ONCE" is the declared semantic — so it is likewise a memoized
      // fixture, file-copied per run (the q84/q85 freshCopy pattern:
      // the refresh commits v2 onto its own copy); measured: the
      // change-feed-driven refresh, the rebuild side, and both
      // answers.
      val silverVt = IncRagSilver.table(s, d)
      val chunker: String => Seq[String] =
        t => graft.text.Chunkers.fixedSize(t, 64)
      val embedder = graft.vector.Md5Embedder(64)
      def embedAll(silver: DataFrame) =
        graft.rag.Retrieval.withEmbeddings(
          graft.rag.Retrieval.chunkTable(silver, chunker), embedder)
      val idxVt = VtFixtures.freshCopy("incrag_idx_v1", d) { dir =>
        Versioned.commit(s, dir,
          embedAll(Versioned.read(s, silverVt, 1)), None, 4)
        ()
      }
      val idxV1 = Versioned.latestVersion(s, idxVt)
      // refresh: the change feed names exactly the docs to re-embed.
      // `fresh` is checkpointed — the chunker + embedder run ONCE for
      // the count and the commit (the measured cost must be the
      // delta's embedding work, not twice it)
      val changed = Versioned.changes(s, silverVt, 1, 2, Seq("id"))
        .select(col("id")).distinct().localCheckpoint(true) // eager: Dedup.minHashNearDups note
      val fresh = embedAll(Versioned.read(s, silverVt, 2)
        .join(changed, Seq("id"), "left_semi")).localCheckpoint(true) // eager: Dedup.minHashNearDups note
      val kept = Versioned.read(s, idxVt, idxV1)
        .join(changed.withColumnRenamed("id", "cid"),
          col("metadata.original_book_id") === col("cid"), "left_anti")
      val reembedded = fresh.count()
      Versioned.commit(s, idxVt, kept.unionByName(fresh), None, 4,
        op = "REFRESH", expected = Some(idxV1))
      val question = "a small polished component"
      val books = Versioned.read(s, silverVt, 2).count()
      def answer(side: String, idx: DataFrame) =
        graft.rag.Retrieval.ask(idx, embedder, question, 3)
          .select(lit(side).as("side"), col("question"),
            col("fallback_used"), col("source"),
            lit(books).as("books"), lit(idx.count()).as("chunks"),
            lit(reembedded).as("reembedded"),
            length(col("prompt")).cast("long").as("prompt_len"))
      val rebuilt = embedAll(Versioned.read(s, silverVt, 2))
        .localCheckpoint(true) // eager (Dedup.minHashNearDups note); embeds once across count + kNN
      answer("incremental", Versioned.read(s, idxVt, idxV1 + 1))
        .unionByName(answer("rebuild", rebuilt))
        .orderBy("side")
    }),

    // c01: CSV round trip — typed write + explicit-schema read (header
    // inference is banned at the lake boundary), aggregate equal to the
    // source table. Doubles survive the text round trip exactly
    // (shortest-round-trip rendering both ways).
    "c01_csv_roundtrip" -> ((s, d) => {
      val dir = tmpDir("csv")
      Lake.writeCsv(Tables.part(s, d)
        .select("p_partkey", "p_brand", "p_type", "p_size", "p_retailprice"), dir)
      Lake.readCsv(s, dir,
        "p_partkey bigint, p_brand string, p_type string, p_size int, p_retailprice double")
        .groupBy("p_brand")
        .agg(count(lit(1)).as("cnt"),
          round(sum("p_retailprice"), 2).as("total_price"),
          sum("p_size").cast("long").as("total_size"))
        .orderBy("p_brand")
    }),

    // c03: COMPRESSED-codec round trip — gzip JSON lines out, codec
    // auto-detected back in (the .gz raw-feed shape every scraped
    // corpus lands as). Scale note, documented not hidden: gzip parts
    // are NON-SPLITTABLE — one task per file on read, so the write
    // side's partition count IS the read side's parallelism ceiling;
    // columnar layers use parquet's internal (splittable) compression
    // instead, this path is for raw text interchange only.
    "c03_gzip_roundtrip" -> ((s, d) => {
      val dir = tmpDir("gzjson")
      Tables.part(s, d)
        .select("p_partkey", "p_brand", "p_type", "p_size", "p_retailprice")
        .write.mode("overwrite").option("compression", "gzip").json(dir)
      Lake.readJson(s, dir)
        .groupBy("p_brand")
        .agg(count(lit(1)).as("cnt"),
          round(sum("p_retailprice"), 2).as("total_price"),
          sum("p_size").cast("long").as("total_size"))
        .orderBy("p_brand")
    }),

    // p04: corrupt-record-tolerant ingestion — the lake boundary's
    // failure mode: a raw feed where every 13th record is truncated
    // mid-JSON. PERMISSIVE scan with an explicit schema + a corrupt
    // column captures bad lines instead of failing the job or silently
    // dropping rows (DROPMALFORMED); the aggregate splits good/corrupt
    // and checks the good rows' payload survives intact. Corruption is
    // injected deterministically from `part`, so the oracle recomputes
    // both populations from the table — the parse path itself is what's
    // under test.
    "p04_corrupt_records" -> ((s, d) => {
      val rawDir = tmpDir("corrupt")
      val lines = Tables.part(s, d).select(
        when(col("p_partkey") % 13 === 0,
          // truncated mid-object — unparseable but attributable
          concat(lit("{\"id\":\""), col("p_partkey").cast("string"), lit("\",\"price\":")))
          .otherwise(to_json(struct(
            col("p_partkey").cast("string").as("id"),
            col("p_name").as("title"),
            col("p_retailprice").as("price")))).as("value"))
      lines.write.mode("overwrite").text(rawDir)
      s.read
        .schema("id string, title string, price double, _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(rawDir)
        .select(when(col("_corrupt_record").isNull, lit("good"))
          .otherwise(lit("corrupt")).as("kind"),
          col("price"))
        .groupBy("kind")
        .agg(count(lit(1)).as("cnt"), round(sum("price"), 2).as("price_sum"))
        .orderBy("kind")
    }),

    // c02: ORC sink → ORC scan round trip (the non-parquet columnar
    // format; filter pushdown + pruning work the same) — read-back
    // aggregate equal to the source table.
    "c02_orc_roundtrip" -> ((s, d) => {
      val dir = tmpDir("orc")
      Lake.writeOrc(Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice"), dir)
      Lake.readOrc(s, dir)
        .filter(col("o_totalprice") > 1000.0)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("o_orderstatus")
    }),

    // x01: salted skew join — result-identical to the plain equi-join
    // (the oracle IS the plain join), with the fact side salted across
    // 8 sub-keys and the dim side replicated (graft.operators.Skew).
    "x01_salted_join" -> ((s, d) =>
      Skew.saltedJoin(
          Tables.lineitem(s, d).select("l_orderkey", "l_extendedprice", "l_discount"),
          Tables.orders(s, d).select("o_orderkey", "o_orderstatus")
            .withColumnRenamed("o_orderkey", "l_orderkey"),
          "l_orderkey", salts = 8)
        .groupBy("o_orderstatus")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"), count(lit(1)).as("cnt"))
        .orderBy("o_orderstatus")),

    // x02: bucketed co-located join as a gated query — both sides
    // written `bucketBy(8, key).sortBy(key)` into the managed catalog,
    // then joined on the bucket key. At scale this is THE lever for
    // repeated joins on one key: the shuffle happens once at write
    // time, every later join is exchange-free (BucketingSpec asserts
    // zero Exchange under the join on the physical plan; here the
    // oracle proves the bucketed write→catalog→read→join path lands
    // byte-identical results).
    "x02_bucketed_join" -> ((s, d) => {
      // Per-(sf dir, JVM) table names, built ONCE per key and consumed
      // READ-ONLY by the join from then on — this IS the bucketing
      // semantics at scale (the shuffle happens once at write time;
      // every later join is exchange-free), so bench reps measure the
      // exchange-free join, not a re-write of the layout. A NEW
      // session's in-memory catalog doesn't know the names while the
      // warehouse DIRECTORY persists on disk (saveAsTable then raises
      // LOCATION_ALREADY_EXISTS), so the build drops both the catalog
      // entry and any orphaned location before writing. CONSTRAINT:
      // deterministic names + the raw location delete assume ONE
      // driver process at a time (true for this harness — bench and
      // verify never overlap); concurrent invocations would need a
      // per-process suffix.
      val sfx = sqlFixtureSuffix(d)
      val (liT, ordT) = (s"li_bkt_x02_$sfx", s"ord_bkt_x02_$sfx")
      VtFixtures.memoVal[Unit]("x02_bucketed", d) {
        Seq(liT, ordT).foreach { t =>
          s.sql(s"DROP TABLE IF EXISTS $t")
          val loc = new org.apache.hadoop.fs.Path(
            s.conf.get("spark.sql.warehouse.dir"), t)
          loc.getFileSystem(s.sparkContext.hadoopConfiguration).delete(loc, true)
        }
        Tables.lineitem(s, d).select("l_orderkey", "l_extendedprice")
          .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .mode("overwrite").saveAsTable(liT)
        Tables.orders(s, d).select("o_orderkey", "o_orderstatus")
          .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .mode("overwrite").saveAsTable(ordT)
      }
      s.table(liT)
        .join(s.table(ordT), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), round(sum("l_extendedprice"), 2).as("gross"))
        .orderBy("o_orderstatus")
    }),

    // x03: dynamic partition pruning — THE partitioned-lake join
    // optimization at scale: the fact side lands partitioned on the
    // join key, the dim side carries a selective predicate, and
    // Catalyst injects a runtime `dynamicpruningexpression` into the
    // fact scan's PartitionFilters so only partitions matching the
    // FILTERED dim's keys are ever listed or read (PlanBehaviorSpec
    // pins the pruning subquery in the plan). On a 100 TB fact table
    // partitioned by day/domain this is the difference between
    // scanning 2 partitions and scanning all of them — no manual
    // predicate copying, the broadcast exchange is REUSED as the
    // pruning filter's source. Money math uses per-row integer cents
    // (the q68 pattern) so the aggregate is summation-order-proof.
    "x03_dpp_join" -> ((s, d) => {
      val factDir = tmpDir("dpp_fact")
      val dimDir = tmpDir("dpp_dim")
      Lake.writeParquetPartitioned(
        Tables.orders(s, d).select(col("o_orderkey"), col("o_orderstatus"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"),
          col("o_orderpriority")),
        factDir, Seq("o_orderpriority"))
      Lake.writeParquet(
        Tables.orders(s, d).select(col("o_orderpriority").as("d_priority")).distinct()
          .withColumn("tier",
            when(substring(col("d_priority"), 1, 1).isin("1", "2"), "hot")
              .otherwise("cold")),
        dimDir)
      Lake.readParquet(s, factDir)
        .join(Lake.readParquet(s, dimDir).filter(col("tier") === "hot"),
          col("o_orderpriority") === col("d_priority"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt"), sum("cents").as("cents_sum"))
        .orderBy("o_orderpriority")
    }),

    // m01: multimodal binary-column pipeline — text ingested as opaque
    // binary content, features extracted through the REAL mapPartitions
    // batch path (graft.multimodal.Media; codec deterministic-stubbed),
    // oracle-checked byte-for-byte (md5 of content, byte length, the
    // documented fake frame count).
    "m01_media_features" -> ((s, d) => {
      import s.implicits._
      val media = Tables.documents(s, d)
        .filter(length(col("text")) > 0)
        .select(col("doc_id").as("media_id"), lit("text").as("kind"),
          col("text").cast("binary").as("content"), col("source"))
        .as[graft.multimodal.MediaRecord]
      graft.multimodal.Media.features(media, graft.multimodal.FakeCodec)
        .toDF()
        .select(col("media_id"), col("mime"), col("byte_len"),
          col("content_hash"), col("frames"))
        .orderBy("media_id")
    }),

    // m02: frame sampling — the one-to-many media op (m01 is 1:1):
    // every 4th fake-decoded frame becomes a fingerprinted row through
    // the same batched-mapPartitions codec boundary. Narrow until the
    // final order; output volume = frames/stride by construction.
    "m02_frame_sample" -> ((s, d) => {
      import s.implicits._
      val media = Tables.documents(s, d)
        .filter(length(col("text")) > 0)
        .select(col("doc_id").as("media_id"), lit("video").as("kind"),
          col("text").cast("binary").as("content"), col("source"))
        .as[graft.multimodal.MediaRecord]
      graft.multimodal.Media.sampleFrames(media, graft.multimodal.FakeCodec, stride = 4)
        .toDF()
        .orderBy("media_id", "frame_idx")
    }),

    // m04: MODALITY-AWARE BATCH ASSEMBLY — the step after curation in a
    // multimodal training pipeline: text items (cost = token count) and
    // image items (cost = frames × 64 patch tokens, m01's documented
    // fake frame count) interleave into fixed 1024-token batches per
    // source, in deterministic doc order. Same scale shape as q54: the
    // packing window partitions by source (one source-keyed shuffle,
    // never a global sort); modality is a deterministic doc_id gate so
    // both engines derive the identical item stream. Per-batch modality
    // counts are what a contrastive/interleaved loader consumes.
    "m04_modal_batches" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val budget = 1024L
      val items = Tables.documents(s, d)
        .filter(length(col("text")) > 0)
        .select(col("doc_id"), col("source"),
          when(col("doc_id") % 4 === 0, lit("image")).otherwise(lit("text"))
            .as("modality"),
          when(col("doc_id") % 4 === 0,
            // integer `div`, not `/`: Column./ on longs is DOUBLE division
            expr("(length(text) div 256 + 1) * 64").cast("long"))
            .otherwise(size(TextFunctions.tokens(col("text"))).cast("long"))
            .as("cost"))
      CurationQueries.packBins(items, "cost", budget, "batch")
        .groupBy("source", "batch")
        .agg(count(when(col("modality") === "text", 1)).as("n_text"),
          count(when(col("modality") === "image", 1)).as("n_image"),
          sum("cost").cast("long").as("batch_cost"))
        .orderBy("source", "batch")
    }),

    // m03: NEAR-DUPLICATE MEDIA via frame fingerprinting — the
    // multimodal dedup op (d01–d09 are text; this is the binary-column
    // counterpart): per-frame content hashes → inverted index →
    // Jaccard over shared fingerprints (Media.fingerprintFrames +
    // nearDupPairs; candidate pairs only where a frame collides, never
    // all-pairs). The fixture BUILDS near-dups deterministically:
    // groups of 3 docs share a base "video" (the group leader's text)
    // and the two non-leaders append a 64-char per-doc trailer, so
    // within-group pairs share every full base frame and differ in the
    // tail — exactly a re-encoded/extended copy. All-ASCII fixture
    // text, so DuckDB's char-wise substr mirrors the byte slicing.
    "m03_media_near_dup" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
        .filter(col("doc_id") < 150 && length(col("text")) > 0)
      val base = docs.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id").as("bid"), col("text").as("base_text"))
      val media = docs
        .withColumn("bid", col("doc_id") - (col("doc_id") % 3))
        .join(base, Seq("bid"))
        .select(col("doc_id").as("media_id"), lit("video").as("kind"),
          concat(col("base_text"),
            when(col("doc_id") % 3 === 0, lit(""))
              .otherwise(repeat(md5(col("doc_id").cast("string")), 2)))
            .cast("binary").as("content"),
          lit("synth").as("source"))
        .as[graft.multimodal.MediaRecord]
      val frames = graft.multimodal.Media.fingerprintFrames(
        media, graft.multimodal.FakeCodec, frameSize = 64)
      graft.multimodal.Media.nearDupPairs(frames, threshold = 0.5)
        .select(col("ma"), col("mb"), col("shared"), col("na"), col("nb"),
          round(col("jaccard"), 4).as("jaccard"))
        .orderBy("ma", "mb")
    }),

    // q50: MERGE/upsert as a TABLE COMMIT (Versioned.mergeCommit over
    // Lake.mergeUpsert) — the Delta/Iceberg `MERGE INTO ... WHEN MATCHED
    // THEN UPDATE WHEN NOT MATCHED THEN INSERT` contract, published
    // through the atomic commit log: orders lands as version 1, a
    // deterministic source of updates (keys % 7 = 0, price uplifted,
    // status 'U') and inserts (fresh keys from % 13 = 0 rows, status
    // 'N') merges in as version 2, and the read binds to version 2's
    // manifest (readers of v1 are isolated — its files are immutable).
    // Prices stay UNROUNDED until the final aggregate: per-row rounding
    // before a sum would let 1-ulp round-implementation differences
    // accumulate across engines.
    "q50_merge_upsert" -> ((s, d) => {
      // shares the base-commit fixture with q79/q98/q82 (file-copied
      // per run); measured: the merge commit + the read.
      val table = VtFixtures.freshCopy("base3col", d)(buildBase3Col(s, d))
      val orders = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val updates = orders.filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
          (col("o_totalprice") * 1.1).as("o_totalprice"))
      val inserts = orders.filter(col("o_orderkey") % 13 === 0)
        .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
          lit("N").as("o_orderstatus"),
          (col("o_totalprice") / 2).as("o_totalprice"))
      Versioned.mergeCommit(s, table, updates.unionByName(inserts), Seq("o_orderkey"))
      Versioned.read(s, table)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("o_orderstatus")
    }),

    // q79: FULL MERGE GRAMMAR / CDC APPLY (Lake.applyChanges = Delta
    // `WHEN MATCHED AND op='D' THEN DELETE / WHEN MATCHED THEN UPDATE /
    // WHEN NOT MATCHED THEN INSERT`, DLT apply_changes): ONE op-coded
    // batch mixing inserts (%13 under fresh keys), updates (%7 minus
    // the delete set, uplifted) and deletes (%11) applies in a single
    // pass — one broadcast anti-join over the fact side plus a union,
    // committed through the versioned log. q50 covers the
    // upsert-only grammar; the D clause is what turns MERGE into the
    // CDC sink primitive.
    "q79_apply_changes" -> ((s, d) => {
      // the base commit is the FIXTURE (shared key: q79/q98/q82 all
      // start from the same 3-column orders commit); measured: the
      // change-apply + commit + read.
      val table = VtFixtures.freshCopy("base3col", d)(buildBase3Col(s, d))
      val orders = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val dels = orders.filter(col("o_orderkey") % 11 === 0)
        .select(col("o_orderkey"), lit(null).cast("string").as("o_orderstatus"),
          lit(null).cast("double").as("o_totalprice"), lit("D").as("op"))
      val upds = orders
        .filter(col("o_orderkey") % 7 === 0 && col("o_orderkey") % 11 =!= 0)
        .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
          (col("o_totalprice") * 1.1).as("o_totalprice"), lit("U").as("op"))
      val ins = orders.filter(col("o_orderkey") % 13 === 0)
        .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
          lit("N").as("o_orderstatus"),
          (col("o_totalprice") / 2).as("o_totalprice"), lit("I").as("op"))
      val changes = dels.unionByName(upds).unionByName(ins)
      Versioned.commit(s, table,
        Lake.applyChanges(Versioned.read(s, table), changes, Seq("o_orderkey")),
        Some("o_orderkey"))
      Versioned.read(s, table)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          countDistinct(col("o_orderkey")).as("n_keys"),
          sum(round(col("o_totalprice") * 100, 0).cast("long"))
            .cast("long").as("total_e2"))
        .orderBy("o_orderstatus")
    }),

    // q98: MERGE WITH SCHEMA EVOLUTION — Delta's `withSchemaEvolution`
    // MERGE: the change feed carries a column the target has never
    // seen (o_priority). applyChanges(evolveSchema = true) unions it
    // in (untouched target rows read null), and the SAME commit's
    // mergeSchemas widens the table schema — one atomic step, no
    // separate ALTER. Per-version schemas survive: time travel to v1
    // still reads three columns (pinned in VersionedSpec). The gate
    // groups by the evolved column with untouched rows in the 'none'
    // bucket, so null-fill, update-fill, and insert-fill are all
    // distinguished.
    "q98_merge_schema_evolution" -> ((s, d) => {
      // shares the base-commit fixture with q79/q82; measured: the
      // evolving merge commit + read.
      val table = VtFixtures.freshCopy("base3col", d)(buildBase3Col(s, d))
      val orders = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val upds = orders.filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          (col("o_totalprice") * 1.1).as("o_totalprice"),
          lit("HI").as("o_priority"), lit("U").as("op"))
      val ins = orders.filter(col("o_orderkey") % 13 === 0)
        .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
          lit("N").as("o_orderstatus"),
          (col("o_totalprice") / 2).as("o_totalprice"),
          lit("NEW").as("o_priority"), lit("I").as("op"))
      Versioned.commit(s, table,
        Lake.applyChanges(Versioned.read(s, table), upds.unionByName(ins),
          Seq("o_orderkey"), evolveSchema = true),
        Some("o_orderkey"), expected = Some(1L))
      Versioned.read(s, table)
        .groupBy(coalesce(col("o_priority"), lit("none")).as("prio"))
        .agg(count(lit(1)).as("cnt"),
          countDistinct(col("o_orderkey")).as("n_keys"),
          sum(round(col("o_totalprice") * 100, 0).cast("long"))
            .cast("long").as("total_e2"))
        .orderBy("prio")
    }),

    // q99: GENERATED COLUMNS — declared ONCE as table metadata
    // (ADD GENERATED price_band AS CASE ...): every subsequent write
    // that omits the column gets it computed inside the commit; a
    // write that supplies it is validated (null-safe equality) through
    // the same atomic CHECK gate as table constraints, so a wrong
    // supplied value aborts before publication. The DDL itself is
    // metadata-only — pre-DDL files are never rewritten and read the
    // column as null (q78 per-version schema semantics). The gate
    // buckets by the generated column with pre-DDL rows in the 'none'
    // bucket, distinguishing compute-on-append from null-carry.
    "q99_generated_columns" -> ((s, d) => {
      val table = tmpDir("vt_gencol")
      val orders = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"))
      Versioned.commit(s, table, orders, Some("o_orderkey"))
      Versioned.addGeneratedColumn(s, table, "price_band",
        "CASE WHEN o_totalprice >= 200000 THEN 'H' " +
          "WHEN o_totalprice >= 100000 THEN 'M' ELSE 'L' END")
      Versioned.appendCommit(s, table,
        orders.filter(col("o_orderkey") % 13 === 0)
          .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
            (col("o_totalprice") / 2).as("o_totalprice")))
      Versioned.read(s, table)
        .groupBy(coalesce(col("price_band"), lit("none")).as("price_band"))
        .agg(count(lit(1)).as("cnt"),
          countDistinct(col("o_orderkey")).as("n_keys"),
          sum(round(col("o_totalprice") * 100, 0).cast("long"))
            .cast("long").as("total_e2"))
        .orderBy("price_band")
    }),

    // q52: SCD TYPE-2 HISTORY — the other standard lakehouse mutation
    // next to MERGE (q50): collapse an event log into versioned rows
    // with [valid_from, valid_to) intervals and an is_current flag.
    // Change points via lag() (one shuffle on the key), interval close
    // via lead() over the SAME partitioning — Catalyst reuses the
    // single sort+exchange for both windows, so the whole derivation is
    // one shuffle end to end. Rows are ordered by the raw timestamp
    // (formatting truncates to seconds; sorting by the string could tie
    // where the underlying instants differ across engines).
    "q52_scd2_history" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val changes = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("prev_type", lag("event_type", 1).over(w))
        .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      changes
        .withColumn("valid_to_ts", lead("ts", 1).over(w))
        .filter(col("user_id") < 30)
        .orderBy("user_id", "ts")
        .select(col("user_id"), col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
          date_format(col("valid_to_ts"), "yyyy-MM-dd HH:mm:ss").as("valid_to"),
          col("valid_to_ts").isNull.as("is_current"))
    }),

    // q65: AS-OF snapshot (time travel) over the q52 SCD2 history —
    // reconstruct every user's state at one instant: the change row
    // whose validity interval covers the as-of timestamp. Same
    // single-shuffle change-point derivation; the snapshot itself is a
    // map-side interval filter, so time travel costs one history scan
    // at any scale.
    "q65_scd2_asof" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val asOf = lit("2024-01-15 00:00:00").cast("timestamp")
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("prev_type", lag("event_type", 1).over(w))
        .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
        .withColumn("valid_to_ts", lead("ts", 1).over(w))
        .filter(col("ts") <= asOf &&
          (col("valid_to_ts").isNull || col("valid_to_ts") > asOf))
        .select(col("user_id"), col("event_type").as("state_at_asof"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("since"))
        .orderBy("user_id")
    }),

    // q67: GDPR-style targeted DELETE as a STATS-PRUNED COMMIT
    // (Versioned.deleteWhereKeyIn) — erasure requests arrive as a KEY
    // TABLE (the right-to-be-forgotten batch), not a predicate. The
    // table is committed range-partitioned on o_custkey, so per-file
    // footer [min,max] stats in the manifest prune the rewrite: only
    // files whose key range intersects a tombstone are anti-joined
    // (tombstones broadcast — no shuffle of the fact side); every other
    // file carries into the new version by reference, byte-identical
    // and never read (asserted in VersionedSpec). The oracle recomputes
    // the surviving population with NOT IN. Totals are integer cents
    // (per-row round to e2, then an exact integer sum) — a double sum
    // rounded once at the end can land on a .xx5 boundary and split
    // across engines' summation orders.
    "q67_gdpr_delete" -> ((s, d) => {
      // the 8-file custkey-clustered commit is the FIXTURE (file-copied
      // per run); measured: the stats-pruned delete + read.
      val table = VtFixtures.freshCopy("gdpr", d) { dir =>
        Versioned.commit(s, dir, Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_orderstatus"), col("o_totalprice")),
          Some("o_custkey"), files = 8)
      }
      val forget = Tables.customer(s, d)
        .filter(col("c_custkey") % 97 === 0)
        .select(col("c_custkey").as("o_custkey"))
      Versioned.deleteWhereKeyIn(s, table, forget, "o_custkey")
      Versioned.read(s, table)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          countDistinct(col("o_custkey")).as("n_cust"),
          sum(round(col("o_totalprice") * 100, 0).cast("long"))
            .cast("long").as("total_e2"))
        .orderBy("o_orderstatus")
    }),

    // q68: CDC / change-data-feed BETWEEN TABLE VERSIONS
    // (Lake.snapshotDiff over Versioned reads) — the Delta
    // `table_changes(v1, v2)` surface: orders commits as version 1, a
    // deterministic mutation (updates %7 uplifted, deletes %11 minus
    // the update set, inserts derived from %13 under fresh keys)
    // commits as version 2, and the diff joins the two manifests'
    // snapshots full-outer on the key classifying insert/update/delete
    // and dropping unchanged. One shuffle at any scale; exchange-free
    // when both snapshots share a bucketed layout.
    "q68_table_cdc" -> ((s, d) => {
      // the 2-version history is the FIXTURE (built once, consumed
      // READ-ONLY — both versions stay addressable forever); measured:
      // the snapshot diff itself. Fresh dir ⇒ versions are 1 and 2.
      val table = VtFixtures.memo("cdc", d) { dir =>
        val orders = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        Versioned.commit(s, dir, orders, Some("o_orderkey"))
        val updates = orders.filter(col("o_orderkey") % 7 === 0)
          .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
            (col("o_totalprice") * 1.1).as("o_totalprice"))
        val inserts = orders.filter(col("o_orderkey") % 13 === 0)
          .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
            lit("N").as("o_orderstatus"),
            (col("o_totalprice") / 2).as("o_totalprice"))
        val deletes = orders
          .filter(col("o_orderkey") % 11 === 0 && col("o_orderkey") % 7 =!= 0)
          .select("o_orderkey")
        Versioned.commit(s, dir,
          Lake.mergeUpsert(orders, updates.unionByName(inserts),
            Seq("o_orderkey"))
            .join(deletes, Seq("o_orderkey"), "left_anti"),
          Some("o_orderkey"))
      }
      val (t1, t2) = (1L, 2L)
      // Integer-cents sum, NOT round(sum(double), 2): the raw delta sum
      // lands on a .xx5 boundary at sf0.01 and the engines' summation
      // orders round it apart; per-row values are bitwise-identical
      // across engines, so per-row rounding + integer sum is exact.
      Lake.snapshotDiff(Versioned.read(s, table, t1),
          Versioned.read(s, table, t2), Seq("o_orderkey"))
        .groupBy("change_type")
        .agg(count(lit(1)).as("cnt"),
          sum(round((coalesce(col("new_o_totalprice"), lit(0.0)) -
            coalesce(col("old_o_totalprice"), lit(0.0))) * 100, 0).cast("long"))
            .cast("long").as("delta_e2"))
        .orderBy("change_type")
    }),

    // q72: STORAGE time travel — the query q65 can't express: q65
    // travels SCD2 *rows* inside one snapshot; here the TABLE ITSELF is
    // versioned and both versions are read back concurrently from their
    // commit manifests (immutable files ⇒ v1's aggregate is unaffected
    // by v2 landing — snapshot isolation by construction). One commit +
    // one mergeCommit, then the same aggregate pinned at each version
    // with a version column. Totals in integer cents (exact sum).
    "q72_storage_timetravel" -> ((s, d) => {
      // versions 1 and 2 of the shared [[OrdersMutations]] fixture ARE
      // this gate's fixture (identical commit + mergeCommit); the v3
      // delete is invisible to time-travel reads of 1 and 2. Measured:
      // the two pinned-version reads.
      val table = OrdersMutations.table(s, d)
      val (v1, v2) = (1L, 2L)
      def agg(version: Long) = Versioned.read(s, table, version)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          sum(round(col("o_totalprice") * 100, 0).cast("long"))
            .cast("long").as("total_e2"))
        .withColumn("version", lit(version - v1 + 1).cast("long"))
      agg(v1).unionByName(agg(v2))
        .select("version", "o_orderstatus", "cnt", "total_e2")
        .orderBy("version", "o_orderstatus")
    }),

    // q75: APPEND-ONLY INGEST through the commit log
    // (Versioned.appendCommit): three ingest batches land as three
    // versions whose manifests grow BY REFERENCE — each append writes
    // only its own files plus one manifest, never touching prior data
    // (the petabyte-table ingest contract; reference-carry pinned in
    // VersionedSpec). The latest snapshot must equal the full table.
    "q75_append_ingest" -> ((s, d) => {
      val table = tmpDir("vt_append")
      val orders = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .cache()
      try {
        (0 to 2).foreach { i =>
          Versioned.appendCommit(s, table,
            orders.filter(col("o_orderkey") % 3 === i),
            Some("o_orderkey"), files = 2, txn = Some(s"ingest-$i"))
        }
        Versioned.read(s, table)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("cnt"),
            countDistinct(col("o_orderkey")).as("n_keys"),
            sum(round(col("o_totalprice") * 100, 0).cast("long"))
              .cast("long").as("total_e2"))
          .orderBy("o_orderstatus")
      } finally orders.unpersist(blocking = false)
    }),

    // q74: CHANGE DATA FEED across a version RANGE (Versioned.changes
    // = Delta table_changes(from, to)): three commits — base, MERGE
    // (updates %7 uplifted + inserts %13 under fresh keys), stats-
    // pruned DELETE of %11 keys — then one call replays everything
    // that happened between v1 and v3, stamped with the version that
    // introduced it. Integer-cents deltas as in q68.
    "q74_change_feed" -> ((s, d) => {
      // shared read-only mutation history (see [[OrdersMutations]])
      val table = OrdersMutations.table(s, d)
      Versioned.changes(s, table, 1L, 3L, Seq("o_orderkey"))
        .groupBy(col("version").cast("long").as("version"), col("change_type"))
        .agg(count(lit(1)).as("cnt"),
          sum(round((coalesce(col("new_o_totalprice"), lit(0.0)) -
            coalesce(col("old_o_totalprice"), lit(0.0))) * 100, 0).cast("long"))
            .cast("long").as("delta_e2"))
        .orderBy("version", "change_type")
    }),

    // q73: EXPECTATIONS on the commit path (DLT-style data-quality
    // gate): rows violating ANY named check are quarantined to a side
    // table through the same commit protocol (nothing silently
    // dropped), passing rows commit, and per-check violation counts
    // come from one aggregation pass. The _committed figure is read
    // BACK from the published snapshot — the gate proves the split
    // landed, not just that the counts add up. Both checks are
    // deterministic predicates the oracle recomputes from orders.
    "q73_commit_expectations" -> ((s, d) => {
      val table = tmpDir("vt_expect")
      val quarantine = tmpDir("vt_expect_q")
      // cache(): the gate is one aggregation pass + two filtered
      // commits over the same input — one scan instead of three.
      val orders = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .cache()
      try {
        val checks = Seq(
          "key_mod97" -> (col("o_orderkey") % 97 =!= 0),
          "price_cap" -> (col("o_totalprice") < 400000.0))
        val (_, _, quarantined, violations) = Versioned.commitWithExpectations(
          s, table, orders, checks, quarantine, Some("o_orderkey"))
        val committed = Versioned.read(s, table).count()
        import s.implicits._
        (Seq("_committed" -> committed, "_quarantined" -> quarantined) ++
          violations.toSeq.map { case (k, v) => s"violation:$k" -> v })
          .sortBy(_._1)
          .toDF("metric", "value")
      } finally orders.unpersist(blocking = false)
    }),

    // q76: RESTORE / rollback (Versioned.restore = Delta RESTORE): a
    // bad mutation (the %11 delete) is rolled back by committing the
    // PRIOR version's file list by reference — metadata-only, zero
    // data I/O regardless of table size (pinned in VersionedSpec), and
    // history stays readable for audit. The latest snapshot must equal
    // the pre-mutation table, which is exactly what the oracle
    // recomputes from orders.
    "q76_restore" -> ((s, d) => {
      // the commit + delete history is the FIXTURE (file-copied per
      // run); measured: the restore + the head read.
      val table = VtFixtures.freshCopy("restore", d) { dir =>
        val orders = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        Versioned.commit(s, dir, orders, Some("o_orderkey"))
        Versioned.deleteWhereKeyIn(s, dir,
          orders.filter(col("o_orderkey") % 11 === 0).select("o_orderkey"),
          "o_orderkey")
      }
      Versioned.restore(s, table, toVersion = 1L)
      Versioned.read(s, table)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          sum(round(col("o_totalprice") * 100, 0).cast("long"))
            .cast("long").as("total_e2"))
        .orderBy("o_orderstatus")
    }),

    // q87: replaceWhere PARTITION OVERWRITE — atomically restate one
    // key range of a versioned table (here: halve the cents of orders
    // 1000–2000, the "re-land one day/shard" contract). The commit
    // lands range-partitioned on the key, so the stats-pruned rewrite
    // touches only files whose [min,max] intersects the range; every
    // other file carries into the new version BY REFERENCE
    // (VersionedSpec pins carried paths verbatim). Readers on v1 keep
    // snapshot isolation; the oracle recomputes the restated state from
    // scratch. Integer cents + integer halving (DIV 2) keep both
    // engines' arithmetic identical.
    "q87_replace_where" -> ((s, d) => {
      // the 8-file cents commit is the FIXTURE (file-copied per run);
      // measured: the stats-pruned range overwrite + read.
      val table = VtFixtures.freshCopy("cents8", d)(buildCents8(s, d))
      val base = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      val restated = base
        .filter(col("o_orderkey").between(1000L, 2000L))
        .withColumn("cents", expr("cents DIV 2"))
      Versioned.replaceWhereRange(s, table, lo = 1000L, hi = 2000L, restated)
      Versioned.read(s, table)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), sum("cents").cast("long").as("cents_sum"))
        .orderBy("o_orderstatus")
    }),

    // q88: CLUSTER-SPEC EVOLUTION through the commit log (Iceberg
    // partition-spec evolution / Delta re-clustering): v1 lands
    // range-clustered on o_orderkey, v2 re-clusters the SAME rows on
    // o_custkey — a new commit whose manifest carries the new stats
    // column. Each version's range reads prune on ITS OWN clustering
    // (VersionedSpec pins both prunings via inputFiles), so a workload
    // shift (order-centric → customer-centric lookups) is served by
    // re-clustering once, without breaking readers pinned to v1 or
    // rewriting history. The gate range-reads BOTH versions on their
    // respective keys; the oracle recomputes both populations from
    // orders.
    "q88_recluster" -> ((s, d) => {
      val table = tmpDir("vt_recluster")
      val base = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      Versioned.commit(s, table, base, Some("o_orderkey"), files = 8)
      // expected: the re-cluster is DERIVED from v1 — without it the
      // commit is last-writer-wins and a concurrent append landing
      // between the read and the publish would be silently dropped
      // (same conflict model as compactCommit's snapshot-derived rewrite)
      Versioned.commit(s, table, Versioned.read(s, table, 1),
        Some("o_custkey"), files = 8, expected = Some(1L))
      // global agg (no groupBy): ALWAYS one row — a groupBy(lit(side))
      // would emit zero rows on an empty key range while the oracle's
      // plain aggregate emits cnt=0, a latent ROWS mismatch
      def agg(side: String, df: DataFrame) = df
        .agg(count(lit(1)).as("cnt"), sum("cents").cast("long").as("cents_sum"),
          countDistinct("o_custkey").as("n_cust"))
        .select(lit(side).as("side"), col("cnt"), col("cents_sum"), col("n_cust"))
      agg("v1_orderkey", Versioned.readKeyRange(s, table, 1000L, 3000L, version = 1))
        .unionByName(
          agg("v2_custkey", Versioned.readKeyRange(s, table, 100L, 300L, version = 2)))
        .orderBy("side")
    }),

    // q77: STATS-PRUNED RANGE READ (Versioned.readKeyRange = manifest
    // data skipping on the read path): the commit lands range-
    // partitioned on o_orderkey across 8 files, so a key-range lookup
    // resolves which files CAN hold the range from the manifest's
    // footer [min,max] stats alone — driver arithmetic, no I/O — and
    // scans only those; the residual filter keeps it exact. At 100 TB
    // this is the difference between a point lookup and a table scan
    // (file-pruning pinned in PlanBehaviorSpec). The oracle recomputes
    // the range over the full table.
    "q77_pruned_range_read" -> ((s, d) => {
      val table = tmpDir("vt_prune")
      val orders = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      Versioned.commit(s, table, orders, Some("o_orderkey"), files = 8)
      Versioned.readKeyRange(s, table, lo = 1000L, hi = 5000L)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"),
          sum(round(col("o_totalprice") * 100, 0).cast("long"))
            .cast("long").as("total_e2"))
        .orderBy("o_orderstatus")
    }),

    // q100: CATALYST-INTEGRATED DATA SKIPPING (VersionedScan — the
    // Delta TahoeFileIndex shape): the versioned snapshot is exposed
    // as a HadoopFsRelation over a custom FileIndex whose listFiles
    // checks the manifest's per-file footer stats against the data
    // filters CATALYST collected — so the plain `.filter(...)`s below
    // prune files inside plan execution with no special read API
    // (readKeyRange/readColRange stay as explicit fast paths; this is
    // the same skipping for users who never see the manifest). The
    // scan also reports the manifest byte-sum as sizeInBytes, so small
    // versioned dims auto-broadcast. Exactness under merge-on-read is
    // part of the contract: the DV anti-join sits ABOVE the scan and
    // user predicates push through it (left-side-only), so skipping
    // and deletes compose. File-count pruning, bloom probes, and the
    // auto-broadcast are pinned in VersionedScanSpec; the oracle
    // recomputes the filtered aggregate from raw orders minus the
    // deleted keys. At 100 TB: planning is O(files) driver arithmetic
    // over the parsed manifest — FileStatuses are SYNTHESIZED from
    // recorded sizes, no listing, no footer I/O.
    "q100_catalyst_scan" -> ((s, d) => {
      val table = tmpDir("vt_cscan")
      val orders = Tables.orders(s, d).select(col("o_orderkey"),
        col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))
      Versioned.commit(s, table, orders, Some("o_orderkey"), files = 8)
      Versioned.deleteMergeOnRead(s, table,
        orders.filter(col("o_orderkey") % 7 === 0).select("o_orderkey"),
        "o_orderkey")
      VersionedScan.read(s, table)
        .filter(col("o_orderkey") <= 6000 &&
          col("o_orderstatus").isin("O", "F"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"),
          sum(round(col("o_totalprice") * 100, 0).cast("long"))
            .cast("long").as("cents_sum"))
        .orderBy("o_orderstatus")
    }),

    // q101: WRITE-AUDIT-PUBLISH (Iceberg's WAP pattern): batches land
    // as STAGED commits — data files physical, manifest outside the
    // version chain, invisible to every reader — then an audit query
    // runs against the WOULD-BE state (readStaged = base + batch) and
    // decides: publish (atomic, one manifest put, conflict-checked
    // against table-rule changes) or drop (directory delete; the live
    // table never referenced the files, so rollback is free). Here the
    // clean third of orders passes its audit and publishes; a poisoned
    // batch (negative prices injected) FAILS the audit and is dropped
    // without ever being visible. The oracle recomputes the surviving
    // table (thirds 0+1) from raw orders; the marker columns pin that
    // one stage published, one dropped, and no stage leaked. At
    // 100 TB: audit cost = the audit queries' scans; a failed batch
    // costs zero table I/O to roll back because nothing was committed.
    "q101_wap" -> ((s, d) => {
      // the published base commit is the FIXTURE (file-copied per run
      // — staging mutates the table dir); measured: both stage/audit
      // cycles, the publish, the drop, and the read.
      val table = VtFixtures.freshCopy("wap3a", d) { dir =>
        Versioned.commit(s, dir, Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
          .filter(col("o_orderkey") % 3 === 0),
          Some("o_orderkey"), files = 4)
      }
      val orders = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      def audit(id: String): Boolean =
        Versioned.readStaged(s, table, id)
          .agg(sum(when(col("o_totalprice") <= 0, 1).otherwise(0)).as("bad"))
          .head().getLong(0) == 0L
      val good = Versioned.stageAppend(s, table,
        orders.filter(col("o_orderkey") % 3 === 1), files = 4)
      val published = audit(good) && { Versioned.publishStaged(s, table, good); true }
      val bad = Versioned.stageAppend(s, table,
        orders.filter(col("o_orderkey") % 3 === 2)
          .withColumn("o_totalprice", col("o_totalprice") - lit(10000000.0)),
        files = 4)
      val dropped = !audit(bad) && { Versioned.dropStaged(s, table, bad); true }
      Versioned.read(s, table)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          sum(round(col("o_totalprice") * 100, 0).cast("long"))
            .cast("long").as("cents_sum"))
        .withColumn("published", lit(if (published) 1L else 0L))
        .withColumn("dropped", lit(if (dropped) 1L else 0L))
        .withColumn("stages_left",
          lit(Versioned.stagedIds(s, table).size.toLong))
        .orderBy("o_orderstatus")
    }),

    // q102: FILES METADATA TABLE (Iceberg's `table$files` / Delta's
    // DESCRIBE DETAIL): the manifest itself as a queryable DataFrame —
    // one row per live file with recorded rows/bytes/key-range/stats
    // coverage — so layout questions (file sizing, range disjointness
    // under the clustered commit, stats presence) are answered with
    // O(files) metadata and ZERO data I/O. The gate proves the
    // range-partitioned commit's contract THROUGH the metadata table:
    // 8 files, every file byte- and stats-backed, pairwise DISJOINT
    // key ranges (overlapping_pairs=0 via a self-join on the metadata,
    // not a scan), totals matching the raw data. The oracle recomputes
    // totals from orders and pins the invariants as constants.
    // q107: MULTI-TERM keyword search — q104's token index under a
    // CONJUNCTION: a file is scanned only if its bitset admits EVERY
    // term, so each added term prunes multiplicatively (the rare term
    // does most of the work — 'dup' alone eliminates ~95% of files;
    // 'batch' then drops the collisions). The residual AND keeps the
    // result exact; in-plan the same conjunction prunes conjunct-by-
    // conjunct (TokenIndexSpec). Oracle: full-scan recompute.
    "q107_multi_term_search" -> ((s, d) => {
      val table = tmpDir("vt_kw2")
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("text"))
      Versioned.commit(s, table, docs, Some("doc_id"), files = 8)
      Versioned.addTokenIndex(s, table, "text")
      Versioned.readKeywordSearchAll(s, table, "text", Seq("dup", "batch"))
        .agg(count(lit(1)).as("cnt"),
          min("doc_id").as("min_doc"), max("doc_id").as("max_doc"),
          countDistinct("source").as("n_sources"))
    }),

    // q106: the FORMAT("graft") BATCH DOOR — the versioned table
    // driven entirely through the standard DataFrame API (no graft
    // imports user-side): `write.format("graft")` creates v1,
    // `.mode("append")` lands v2 as an append commit,
    // `read.format("graft")` resolves the latest snapshot and
    // `.option("versionAsOf", 1)` time-travels — then a filtered
    // aggregate over the current snapshot carries v1's row count as a
    // constant column, proving both reads resolved the right
    // manifests. The read relation hands Spark the inner scan's
    // InternalRows (needConversion=false) with manifest file skipping
    // intact (GraftSourceSpec). Oracle: recompute both slices from
    // orders.
    "q106_format_door" -> ((s, d) => {
      val table = tmpDir("vt_fmt")
      val orders = Tables.orders(s, d)
      orders.filter(col("o_orderkey") <= 2000)
        .write.format("graft").option("key", "o_orderkey").save(table)
      orders.filter(col("o_orderkey") > 2000 && col("o_orderkey") <= 4000)
        .write.format("graft").mode("append").save(table)
      val v1Rows = s.read.format("graft").option("versionAsOf", "1")
        .load(table).count()
      s.read.format("graft").load(table)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents"))
        .withColumn("v1_rows", lit(v1Rows))
        .orderBy("o_orderstatus")
    }),

    // q109: PHRASE SEARCH through the token index — q107's conjunction
    // pruning with an ADJACENCY residual: a file containing the phrase
    // as adjacent whitespace tokens necessarily contains every term as
    // a token (whole-token match demands a space or edge on both sides
    // of each term), so pruning on all terms is lossless; the residual
    // `' '||lower(text)||' '` CONTAINS `' table hash '` then keeps the
    // result exact — whole-token adjacency, no mid-token matches. At
    // 100 TB this is the contamination-sweep primitive ("find every
    // document quoting this benchmark sentence") at posting-list cost:
    // the rarest phrase term prunes the file set, the contains() scans
    // only what survives. Oracle: full-scan LIKE recompute.
    "q109_phrase_search" -> ((s, d) => {
      val table = tmpDir("vt_phrase")
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("text"))
      Versioned.commit(s, table, docs, Some("doc_id"), files = 8)
      Versioned.addTokenIndex(s, table, "text")
      Versioned.readPhraseSearch(s, table, "text", "table hash")
        .groupBy("source")
        .agg(count(lit(1)).as("cnt"),
          min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
        .orderBy("source")
    }),

    // q104: TOKEN (INVERTED) INDEX keyword search — the full-text
    // analogue of the q-series bloom index: ADD TOKEN INDEX blooms the
    // DISTINCT lowercase whitespace tokens of `text` per file into the
    // manifest (one distributed pass, then maintained batch-locally by
    // every write path), and a keyword probe skips every file whose
    // token set provably lacks the term — O(files) driver bitset
    // tests, then a scan of only the files that can contain it, with
    // the residual array_contains keeping the result exact under bloom
    // false positives. The same predicate shape prunes IN-PLAN through
    // VersionedScan/graft_table (TokenIndexSpec pins both paths plus
    // append/OPTIMIZE maintenance). At 100 TB this turns a corpus grep
    // — the operation every training-data pipeline runs constantly
    // (contamination checks, tag lookups, PII term sweeps) — into a
    // posting-list probe. 'dup' is the fixture's rare token (~5% of
    // docs); the oracle recomputes the search by full scan.
    "q104_keyword_index" -> ((s, d) => {
      val table = tmpDir("vt_kw")
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("text"))
      Versioned.commit(s, table, docs, Some("doc_id"), files = 8)
      Versioned.addTokenIndex(s, table, "text")
      Versioned.readKeywordSearch(s, table, "text", "dup")
        .groupBy("source")
        .agg(count(lit(1)).as("cnt"),
          min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
        .orderBy("source")
    }),

    // q103: SQL TABLE-VALUED FUNCTIONS over the versioned format — the
    // SQL front door q100 built for the Column API: `graft_table(path
    // [, version])` resolves (at analysis time, via
    // SparkSessionExtensions.injectTableFunction) to the SAME
    // VersionedFileIndex-backed relation VersionedScan.read returns,
    // so a plain SQL WHERE prunes manifest files in-plan and `VERSION
    // AS OF` semantics need no special syntax — the version argument
    // pins the snapshot (timestamp literals resolve through the
    // commit-ts walk; both pinned in SqlTvfSpec, file-skipping
    // included). Here both versions of a merged table are read IN ONE
    // SQL STATEMENT (snapshot isolation across versions inside a
    // single query plan), filtered, and aggregated; the commits marker
    // comes from graft_history's row count. At 100 TB this is what
    // lets the SQL-only user — BI tools, notebooks — hit the manifest
    // fast paths without a line of Scala.
    "q103_sql_tvf" -> ((s, d) => {
      val table = tmpDir("vt_tvf")
      val orders = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      Versioned.commit(s, table, orders, Some("o_orderkey"), files = 8)
      val upd = orders.filter(col("o_orderkey") % 5 === 0)
        .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
          (col("o_totalprice") * 2).as("o_totalprice"))
      Versioned.mergeCommit(s, table, upd, Seq("o_orderkey"))
      val commits = s.sql(s"SELECT count(*) FROM graft_history('$table')")
        .head().getLong(0)
      s.sql(
        s"""SELECT version, o_orderstatus, count(*) AS cnt,
           |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           |    AS cents_sum
           |FROM (
           |  SELECT CAST(1 AS BIGINT) AS version, o_orderstatus, o_totalprice
           |  FROM graft_table('$table', 1) WHERE o_orderkey <= 3000
           |  UNION ALL
           |  SELECT CAST(2 AS BIGINT) AS version, o_orderstatus, o_totalprice
           |  FROM graft_table('$table') WHERE o_orderkey <= 3000
           |)
           |GROUP BY version, o_orderstatus""".stripMargin)
        .withColumn("commits", lit(commits))
        .orderBy("version", "o_orderstatus")
    }),

    "q102_files_metadata" -> ((s, d) => {
      val table = tmpDir("vt_files")
      val orders = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      Versioned.commit(s, table, orders, Some("o_orderkey"), files = 8)
      val ft = Versioned.filesTable(s, table)
      val overlapping = ft.as("a").join(ft.as("b"),
        col("a.path") < col("b.path") &&
          col("a.min_key") <= col("b.max_key") &&
          col("b.min_key") <= col("a.max_key")).count()
      ft.agg(
        count(lit(1)).as("n_files"),
        sum("rows").cast("long").as("total_rows"),
        min("min_key").as("min_key"),
        max("max_key").as("max_key"),
        sum(when(col("bytes") > 0, 0).otherwise(1)).cast("long")
          .as("files_without_bytes"),
        sum(when(col("n_stat_cols") > 0, 0).otherwise(1)).cast("long")
          .as("files_without_stats"))
        .withColumn("overlapping_pairs", lit(overlapping))
    }),

    // q92: INCREMENTAL RE-CLUSTERING (Delta Liquid's contract; the
    // O(violators) companion to q88's whole-table re-cluster): ingest
    // arrives custkey-banded (each batch's files tight on o_custkey)
    // under the OLD o_orderkey clustering, plus one unbanded batch
    // spanning the whole custkey domain. reclusterIncremental evolves
    // the spec to o_custkey rewriting ONLY the wide files — banded
    // files carry by reference with their manifest range re-derived
    // from the per-column stats (carried-paths pinned in
    // VersionedSpec); at 100 TB a workload shift costs the violating
    // tail, not a table rewrite. The gate range-reads the NEW spec and
    // totals the table; the oracle recomputes both from orders.
    // q93: CHECK CONSTRAINTS through the commit log (Delta table
    // constraints): v1 lands a third of orders, ADD CONSTRAINT then
    // validates the existing snapshot and becomes a metadata-only
    // commit; a conforming append passes the write-path gate; an
    // append whose batch breaks the checks is REJECTED atomically —
    // no version lands, the orphaned files are removed, and the table
    // still reads as the last good version. The gate's cost model is
    // the one that survives 100 TB: enforcement scans the incoming
    // BATCH (column-pruned, all constraints OR'd into one predicate),
    // never the table; only the one-time ADD CONSTRAINT validation
    // scans the snapshot. The oracle recomputes the surviving rows
    // (thirds 0 and 1) straight from orders; `rejected`/`n_constraints`
    // pin that the violating batch threw and the constraint set
    // survived the rejection.
    "q93_check_constraints" -> ((s, d) => {
      val table = tmpDir("vt_check")
      val orders = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      Versioned.commit(s, table, orders.filter(col("o_orderkey") % 3 === 0),
        Some("o_orderkey"), files = 4)
      Versioned.addCheckConstraint(s, table, "price_pos", "o_totalprice > 0")
      Versioned.addCheckConstraint(s, table, "status_nn",
        "o_orderstatus IS NOT NULL")
      Versioned.appendCommit(s, table,
        orders.filter(col("o_orderkey") % 3 === 1), files = 4)
      val rejected =
        try {
          Versioned.appendCommit(s, table,
            orders.filter(col("o_orderkey") % 3 === 2)
              .withColumn("o_totalprice",
                col("o_totalprice") - lit(10000000.0)),
            files = 4)
          0L
        } catch { case _: Versioned.ConstraintViolationException => 1L }
      val nCs = Versioned.snapshot(s, table).constraints.size.toLong
      Versioned.read(s, table)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          sum(round(col("o_totalprice") * 100, 0).cast("long"))
            .cast("long").as("cents_sum"))
        .withColumn("rejected", lit(rejected))
        .withColumn("n_constraints", lit(nCs))
        .orderBy("o_orderstatus")
    }),

    // q96: OPTIMIZE ZORDER through the commit log (Delta
    // `OPTIMIZE ZORDER BY`): lineitem lands UNCLUSTERED (every file
    // spans both dimensions), then one atomic ZORDER commit rewrites
    // the snapshot Morton-sorted on (l_partkey, l_suppkey). The
    // manifest's per-column footer stats come out tight on BOTH
    // dimensions, so readColRange prunes range predicates on EITHER
    // column — the property no single-key sort provides (pruning on
    // both dims pinned in VersionedSpec on a controlled grid). The
    // residual filter keeps results exact; the oracle recomputes both
    // probes straight from lineitem.
    "q96_zorder_commit" -> ((s, d) => {
      // the unclustered lineitem base commit is the FIXTURE
      // (file-copied per run); measured: the z-order rewrite + the two
      // pruned band probes.
      val table = VtFixtures.freshCopy("zli6", d) { dir =>
        Versioned.commit(s, dir, Tables.lineitem(s, d)
          .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"),
            col("l_extendedprice")),
          None, files = 6)
      }
      Versioned.zorderCommit(s, table, "l_partkey", "l_suppkey", files = 6)
      def probe(tag: String, dfp: DataFrame) = dfp
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity").cast("long")).cast("long").as("qty"),
          sum(round(col("l_extendedprice") * 100, 0).cast("long"))
            .cast("long").as("cents_sum"))
        .withColumn("side", lit(tag))
        .select("side", "cnt", "qty", "cents_sum")
      probe("part_band",
          Versioned.readColRange(s, table, "l_partkey", 100L, 300L))
        .unionAll(probe("supp_band",
          Versioned.readColRange(s, table, "l_suppkey", 10L, 40L)))
        .orderBy("side")
    }),

    // q97: METADATA-ONLY AGGREGATES (Delta's metadata query
    // optimization): COUNT(*) and the commit-key MIN/MAX answered
    // from the manifest — O(files) driver arithmetic, zero data I/O;
    // at 100 TB a row count costs a manifest parse. After a
    // merge-on-read DELETE the count stays metadata-exact (physical
    // rows minus DV tombstones) while the key range becomes honestly
    // UNKNOWN (a tombstone may have removed the extreme row) — the
    // gate pins both the exact values and that conservatism flag
    // against an oracle that recomputes them from orders.
    "q97_metadata_agg" -> ((s, d) => {
      // the 2-commit base is the FIXTURE (file-copied per run — the
      // gate lands a MoR delete mid-flight); measured: the manifest
      // aggregates + the DV commit between them.
      val table = VtFixtures.freshCopy("meta2c", d) { dir =>
        val orders = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        Versioned.commit(s, dir, orders.filter(col("o_orderkey") % 2 === 0),
          Some("o_orderkey"), files = 4)
        Versioned.appendCommit(s, dir,
          orders.filter(col("o_orderkey") % 2 === 1), files = 4)
      }
      val orders = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val cntAll = Versioned.metaCount(s, table)
      val (mn, mx) = Versioned.metaKeyRange(s, table).get
      Versioned.deleteMergeOnRead(s, table,
        orders.filter(col("o_orderkey") % 5 === 0).select("o_orderkey"),
        "o_orderkey")
      val cntMor = Versioned.metaCount(s, table)
      val rangeKnown = if (Versioned.metaKeyRange(s, table).isDefined) 1L else 0L
      s.range(1).select(lit(cntAll).as("cnt_all"), lit(mn).as("min_key"),
        lit(mx).as("max_key"), lit(cntMor).as("cnt_after_mor"),
        lit(rangeKnown).as("range_known_after_mor"))
    }),

    // q95: BLOOM-INDEXED POINT LOOKUP (Delta bloom filter index): the
    // table arrives in o_custkey bands and is range-laid-out on
    // o_custkey, so every file's o_orderkey [min,max] spans the whole
    // domain — min/max data skipping is blind to an orderkey equality.
    // ADD BLOOM INDEX computes per-file bitsets in one distributed
    // pass; appends after it bloom their own batch on the write path;
    // readPointLookup then probes O(files) bitsets driver-side and
    // scans only files that can contain the key (pruning pinned in
    // VersionedSpec; false positives only cost I/O — the residual
    // equality filter keeps the result exact). Lookup keys are the
    // table's own min/max orderkey, so the gate is deterministic at
    // any scale factor and the oracle recomputes them from orders.
    "q95_bloom_point_lookup" -> ((s, d) => {
      // the banded ingest + bloom index build is the FIXTURE (built
      // once, consumed read-only — the amortization a persisted index
      // exists for); the measured operator is the two point lookups.
      val table = VtFixtures.memo("bloom", d) { dir =>
        val orders = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            col("o_totalprice"))
        Seq(0, 1, 2).foreach { band =>
          Versioned.appendCommit(s, dir,
            orders.filter(pmod(col("o_custkey"), lit(3)) === band),
            Some("o_custkey"), files = 3)
        }
        Versioned.addBloomIndex(s, dir, "o_orderkey", bits = 1 << 15)
      }
      val bounds = VtFixtures.memoVal("bloom_bounds", d) {
        val r = Tables.orders(s, d)
          .agg(min("o_orderkey"), max("o_orderkey")).head()
        (r.getLong(0), r.getLong(1))
      }
      Seq(bounds._1, bounds._2)
        .map(k => Versioned.readPointLookup(s, table, "o_orderkey", k))
        .reduce(_ unionAll _)
        .select(col("o_orderkey"), col("o_orderstatus"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
        .orderBy("o_orderkey")
    }),

    // q94: TIME TRAVEL BY TIMESTAMP (`TIMESTAMP AS OF`): three commits
    // land with recorded commit times; resolving AS OF a point between
    // the 2nd and 3rd returns exactly version 2's rows. Resolution
    // monotonizes recorded times against the version axis (Delta's
    // commit-timestamp adjustment) and costs O(versions) driver-side
    // manifest reads — no data I/O until the chosen snapshot scans.
    // Fixture timestamps are injected so the gate is deterministic;
    // production commits default to the writer's clock. The oracle
    // recomputes version 2's population (quarters 0 and 1) from orders.
    "q94_time_travel_ts" -> ((s, d) => {
      // the pinned-timestamp commit history is the FIXTURE (built once,
      // consumed READ-ONLY); measured: the as-of resolution + read.
      val table = VtFixtures.memo("tsfix", d) { dir =>
        val orders = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        Versioned.commit(s, dir, orders.filter(col("o_orderkey") % 4 === 0),
          Some("o_orderkey"), files = 4, ts = Some(1000L))
        Versioned.appendCommit(s, dir,
          orders.filter(col("o_orderkey") % 4 === 1), files = 4,
          ts = Some(2000L))
        Versioned.appendCommit(s, dir,
          orders.filter(col("o_orderkey") % 4 === 2), files = 4,
          ts = Some(3000L))
      }
      Versioned.readAsOf(s, table, 2500L)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"),
          sum(round(col("o_totalprice") * 100, 0).cast("long"))
            .cast("long").as("cents_sum"))
        .orderBy("o_orderstatus")
    }),

    "q92_incr_recluster" -> ((s, d) => {
      // the banded 4-append ingest is the FIXTURE (file-copied per
      // run); measured: the incremental recluster + both reads.
      val table = VtFixtures.freshCopy("increc", d) { dir =>
        val orders = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
        Seq(col("o_custkey") <= 150L,
            col("o_custkey").between(151L, 300L),
            col("o_custkey").between(301L, 600L))
          .foreach { band =>
            Versioned.appendCommit(s, dir,
              orders.filter(band && col("o_orderkey") % 5 =!= 0),
              Some("o_orderkey"), files = 2)
          }
        Versioned.appendCommit(s, dir,
          orders.filter(col("o_custkey") > 600L ||
            (col("o_orderkey") % 5 === 0)), files = 2)
      }
      Versioned.reclusterIncremental(s, table, "o_custkey", files = 4)
      def agg(side: String, df: DataFrame) = df
        .agg(count(lit(1)).as("cnt"), sum("cents").cast("long").as("cents_sum"),
          countDistinct("o_custkey").as("n_cust"))
        .select(lit(side).as("side"), col("cnt"), col("cents_sum"), col("n_cust"))
      agg("probe", Versioned.readKeyRange(s, table, 151L, 300L))
        .unionByName(agg("total", Versioned.read(s, table)))
        .orderBy("side")
    }),

    // q91: SIZE-TIERED OPTIMIZE (Delta OPTIMIZE binpack): a big base
    // commit plus a streaming-style tail of small appends, then
    // compactSmallFiles packs ONLY the tail toward the largest
    // existing file's size (driver arithmetic over the manifest's
    // recorded per-file bytes) — the base files carry by reference,
    // the repack is range-partitioned on the commit key so the packed
    // files keep prunable disjoint ranges, and at 100 TB the
    // maintenance tick costs O(small tail), never a table rewrite
    // (file-size band + carried-paths pinned in VersionedSpec). The
    // gate proves the table's CONTENT is untouched by the repack; the
    // oracle recomputes from orders.
    "q91_optimize_binpack" -> ((s, d) => {
      // base commit + small-append tail is the FIXTURE (file-copied per
      // run); measured: the manifest arithmetic + the repack + the read.
      val table = VtFixtures.freshCopy("binpack", d) { dir =>
        val orders = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderstatus"),
            round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
        Versioned.commit(s, dir, orders.filter(col("o_orderkey") % 10 < 6),
          Some("o_orderkey"), files = 2)
        (6 to 9).foreach { m =>
          Versioned.appendCommit(s, dir,
            orders.filter(col("o_orderkey") % 10 === m), files = 2)
        }
      }
      val target = Versioned.snapshot(s, table).files.map(_.bytes).max
      Versioned.compactSmallFiles(s, table, target)
      Versioned.read(s, table)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), sum("cents").cast("long").as("cents_sum"),
          min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"))
        .orderBy("o_orderstatus")
    }),

    // q89: SCHEMA EVOLUTION BEYOND ADD-COLUMN (Delta column mapping +
    // type widening): v1 lands integer cents keyed on o_orderkey; v2
    // RENAMES cents→price_e2 as a metadata-only commit (the mapping
    // indirects logical→physical, files carry by reference); v3
    // APPENDS under the NEW logical name (physically landing in the
    // old column); v4 WIDENS int→long — again metadata-only, the
    // manifest's physical schema records the wide type and the Spark 4
    // parquet reader upcasts the old INT32 files at scan time. At
    // 100 TB each of these schema changes costs one manifest write,
    // never a rewrite. The gate reads the latest table: every row
    // under the renamed name, min/max typed LONG because of the widen;
    // the oracle rebuilds the same union from orders.
    "q89_column_mapping" -> ((s, d) => {
      // the rename/append/widen history is the FIXTURE (each schema op
      // a metadata-only commit, built once, consumed READ-ONLY);
      // measured: the mapped + upcast read that proves the contract.
      val table = VtFixtures.memo("colmap", d) { dir =>
        def cents(c: org.apache.spark.sql.Column) =
          round(c * 100, 0).cast("int")
        Versioned.commit(s, dir,
          Tables.orders(s, d).filter(col("o_orderkey") % 2 === 0)
            .select(col("o_orderkey"), col("o_orderstatus"),
              cents(col("o_totalprice")).as("cents")),
          Some("o_orderkey"), files = 4)
        Versioned.renameColumn(s, dir, "cents", "price_e2")
        Versioned.appendCommit(s, dir,
          Tables.orders(s, d).filter(col("o_orderkey") % 2 === 1)
            .select(col("o_orderkey"), col("o_orderstatus"),
              cents(col("o_totalprice")).as("price_e2")),
          files = 4)
        Versioned.widenColumn(s, dir, "price_e2")
      }
      Versioned.read(s, table)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          sum(col("price_e2")).cast("long").as("total_e2"),
          min(col("price_e2")).as("min_e2"),
          max(col("price_e2")).as("max_e2"))
        .orderBy("o_orderstatus")
    }),

    // q90: NON-KEY stats pruning (Versioned.readColRange over the
    // per-column manifest stats — Delta add-file data skipping beyond
    // the clustering key): the table is committed/keyed on o_orderkey,
    // but ingest arrives in custkey-banded batches (tenant-sharded
    // arrival), so each append's files carry tight o_custkey footer
    // ranges in the manifest even though nothing is clustered on it. A
    // range read on the SECOND column then prunes to the one batch
    // whose band intersects — at 100 TB a per-tenant read touches that
    // tenant's ingest files, not the table (file-pruning pinned in
    // VersionedSpec via inputFiles). Residual filter keeps it exact;
    // the oracle recomputes the range over the full table.
    "q90_nonkey_stats_prune" -> ((s, d) => {
      // the custkey-banded 4-append ingest is the FIXTURE (built once,
      // consumed READ-ONLY); measured: the stats-pruned range read.
      val table = VtFixtures.memo("colprune", d) { dir =>
        val orders = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            col("o_totalprice"))
        Seq(col("o_custkey") <= 150L,
            col("o_custkey").between(151L, 300L),
            col("o_custkey").between(301L, 600L),
            col("o_custkey") > 600L)
          .foreach { band =>
            Versioned.appendCommit(s, dir, orders.filter(band),
              Some("o_orderkey"), files = 2)
          }
      }
      Versioned.readColRange(s, table, "o_custkey", 151L, 300L)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          min(col("o_custkey")).as("min_cust"),
          max(col("o_custkey")).as("max_cust"),
          sum(round(col("o_totalprice") * 100, 0).cast("long"))
            .cast("long").as("total_e2"))
        .orderBy("o_orderstatus")
    }),

    // q78: SCHEMA EVOLUTION through the commit log: v1 lands without
    // o_totalprice, an appendCommit lands new rows WITH it, and the
    // merged latest read surfaces the union schema — old rows null in
    // the added column (never fabricated), new rows carry it. Per-
    // version schema pinning is the flip side (VersionedSpec: a v1
    // reader never sees the later column). The oracle rebuilds the
    // same union with an explicit NULL column for the v1 half.
    "q78_schema_evolution" -> ((s, d) => {
      val table = tmpDir("vt_schema")
      val orders = Tables.orders(s, d)
      Versioned.commit(s, table,
        orders.filter(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey"), col("o_orderstatus")),
        Some("o_orderkey"))
      Versioned.appendCommit(s, table,
        orders.filter(col("o_orderkey") % 2 === 1)
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice")))
      Versioned.read(s, table)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          count(col("o_totalprice")).as("with_price"),
          sum(when(col("o_totalprice").isNull, 0L)
            .otherwise(round(col("o_totalprice") * 100, 0).cast("long")))
            .cast("long").as("total_e2"))
        .orderBy("o_orderstatus")
    }),

    // q83: INCREMENTAL VIEW MAINTENANCE off the change feed — the
    // capability the CDF exists for: a materialized per-group summary
    // is kept current by applying per-group DELTAS from
    // Versioned.changes(v1, v3) instead of rescanning the base table.
    // Group-key churn is the classic IVM trap and is handled the
    // algebraic way: every change row splits into a −contribution
    // under its OLD key (update/delete) and a +contribution under its
    // NEW key (update/insert); summing contributions per group gives
    // the exact delta, including rows that MOVED between groups and
    // groups that empty out (cnt>0 filter). At 100 TB the view refresh
    // costs O(changed rows), not O(table) — the whole point. The gate
    // emits BOTH the maintained view and a direct recompute of the
    // latest snapshot under side tags; both must match the same oracle
    // rows, so the maintenance algebra is proven equal to recompute
    // inside the engine AND against DuckDB.
    "q83_incremental_view" -> ((s, d) => {
      // shared read-only mutation history (see [[OrdersMutations]])
      val table = OrdersMutations.table(s, d)
      locally {
        val v1 = 1L
        val v3 = 3L
        val view1 = Versioned.read(s, table, v1)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("cnt"),
            sum(round(col("o_totalprice") * 100, 0).cast("long"))
              .cast("long").as("total_e2"))
        val ch = Versioned.changes(s, table, v1, v3, Seq("o_orderkey"))
        val minus = ch.filter(col("change_type").isin("update", "delete"))
          .select(col("old_o_orderstatus").as("o_orderstatus"),
            lit(-1L).as("dc"),
            (-round(col("old_o_totalprice") * 100, 0)).cast("long").as("dp"))
        val plus = ch.filter(col("change_type").isin("update", "insert"))
          .select(col("new_o_orderstatus").as("o_orderstatus"),
            lit(1L).as("dc"),
            round(col("new_o_totalprice") * 100, 0).cast("long").as("dp"))
        val delta = minus.unionByName(plus)
          .groupBy("o_orderstatus")
          .agg(sum(col("dc")).as("dc"), sum(col("dp")).as("dp"))
        val incremental = view1.join(delta, Seq("o_orderstatus"), "full_outer")
          .select(col("o_orderstatus"),
            (coalesce(col("cnt"), lit(0L)) + coalesce(col("dc"), lit(0L)))
              .cast("long").as("cnt"),
            (coalesce(col("total_e2"), lit(0L)) + coalesce(col("dp"), lit(0L)))
              .cast("long").as("total_e2"))
          .filter(col("cnt") > 0)
          .withColumn("side", lit("incremental"))
        val recompute = Versioned.read(s, table, v3)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("cnt"),
            sum(round(col("o_totalprice") * 100, 0).cast("long"))
              .cast("long").as("total_e2"))
          .withColumn("side", lit("recompute"))
        incremental.unionByName(recompute)
          .select("side", "o_orderstatus", "cnt", "total_e2")
          .orderBy("side", "o_orderstatus")
      }
    }),

    // q84: DELETION VECTORS — merge-on-read DELETE
    // (Versioned.deleteMergeOnRead = Delta DVs / Iceberg v2 deletes):
    // two deletes land as two versions that change NO data file — each
    // writes only a tombstone sidecar the read path broadcast-anti-
    // joins away (second delete accumulates into the first). OPTIMIZE
    // then reads THROUGH the DV and publishes clean files (Delta's
    // purge). The gate reads the MoR version (pinned pre-compaction —
    // immutable files make that sound) and the optimized version; both
    // must equal the doubly-deleted population. Zero-rewrite and
    // restore/time-travel interplay are pinned in VersionedSpec.
    "q84_delete_vectors" -> ((s, d) => {
      // the 8-file base commit is the FIXTURE (file-copied per run);
      // measured: the two MoR deletes, both reads, and the purge.
      val table = VtFixtures.freshCopy("base8col", d)(buildBase8Col(s, d))
      val orders = Tables.orders(s, d)
      Versioned.deleteMergeOnRead(s, table,
        orders.filter(col("o_orderkey") % 13 === 0).select("o_orderkey"),
        "o_orderkey")
      Versioned.deleteMergeOnRead(s, table,
        orders.filter(col("o_orderkey") % 17 === 0).select("o_orderkey"),
        "o_orderkey")
      def agg(side: String) = Versioned.read(s, table)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          sum(round(col("o_totalprice") * 100, 0).cast("long"))
            .cast("long").as("total_e2"))
        .withColumn("side", lit(side))
      val mor = agg("mor") // binds v3's manifest (files + DV) now
      Versioned.compactCommit(s, table, targetFiles = 2)
      mor.unionByName(agg("optimized"))
        .select("side", "o_orderstatus", "cnt", "total_e2")
        .orderBy("side", "o_orderstatus")
    }),

    // q85: MERGE-ON-READ UPSERT (Versioned.upsertMergeOnRead = Hudi's
    // MOR write path / Delta UPDATE-with-DVs): the q50 merge recipe
    // executed with ZERO rewrite of existing files — one atomic commit
    // appends the source rows and positionally tombstones every old
    // occurrence of an updated key. Gate reads the MoR version AND the
    // post-OPTIMIZE materialization; both must equal the same merged
    // population the copy-on-write q50 produces (same oracle recipe) —
    // the two write paths are semantically indistinguishable, which is
    // the MOR contract. Atomicity/composition pinned in VersionedSpec.
    "q85_mor_upsert" -> ((s, d) => {
      // the 8-file base commit is the FIXTURE (file-copied per run);
      // measured: the MoR upsert, both reads, and the compaction.
      val table = VtFixtures.freshCopy("base8col", d)(buildBase8Col(s, d))
      val orders = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val updates = orders.filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
          (col("o_totalprice") * 1.1).as("o_totalprice"))
      val inserts = orders.filter(col("o_orderkey") % 13 === 0)
        .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
          lit("N").as("o_orderstatus"),
          (col("o_totalprice") / 2).as("o_totalprice"))
      Versioned.upsertMergeOnRead(s, table,
        updates.unionByName(inserts), "o_orderkey", files = 4)
      def agg(side: String) = Versioned.read(s, table)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          sum(round(col("o_totalprice") * 100, 0).cast("long"))
            .cast("long").as("total_e2"))
        .withColumn("side", lit(side))
      val mor = agg("mor") // binds the MoR manifest now
      Versioned.compactCommit(s, table, targetFiles = 2)
      mor.unionByName(agg("optimized"))
        .select("side", "o_orderstatus", "cnt", "total_e2")
        .orderBy("side", "o_orderstatus")
    }),

    // q80: DESCRIBE HISTORY — the commit log itself as a queryable
    // relation (Versioned.history): five versions produced by five
    // different operations (COMMIT, APPEND, DELETE, OPTIMIZE, RESTORE),
    // read back from manifests alone — O(versions) driver JSON parses,
    // zero data I/O regardless of table size. The oracle recomputes
    // each version's population count from orders, which checks both
    // the operation labels and that every manifest's footer-derived
    // row counts equal the true row counts.
    "q80_history" -> ((s, d) => {
      // the 5-operation history is the FIXTURE (built once, consumed
      // READ-ONLY); measured: the history read itself.
      val table = VtFixtures.memo("history", d) { dir =>
        val orders = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
          .cache()
        try {
          Versioned.commit(s, dir,
            orders.filter(col("o_orderkey") % 3 === 0), Some("o_orderkey"))
          Versioned.appendCommit(s, dir,
            orders.filter(col("o_orderkey") % 3 === 1), txn = Some("batch-1"))
          Versioned.deleteWhereKeyIn(s, dir,
            orders.filter(col("o_orderkey") % 7 === 0).select("o_orderkey"),
            "o_orderkey")
          Versioned.compactCommit(s, dir, targetFiles = 2)
          Versioned.restore(s, dir, toVersion = 2)
        } finally orders.unpersist(blocking = false)
      }
      Versioned.history(s, table)
        .select(col("version"), col("operation"), col("n_rows"))
        .orderBy("version")
    }),

    // q81: VACUUM — physical reclamation through the commit log
    // (Versioned.vacuum): a wide base commit, a stats-pruned DELETE,
    // an OPTIMIZE rewrite, then vacuum(keep=2) drops v1's manifest and
    // every data file only v1 referenced. The gate reads BOTH kept
    // versions back after vacuum (v2 the delete, v3 the compaction —
    // same population by construction), proving reclamation deleted
    // nothing any kept manifest references; physical deletion + the
    // unreadability of v1 are pinned in VersionedSpec.
    "q81_vacuum" -> ((s, d) => {
      // the commit + delete + compaction history is the FIXTURE
      // (file-copied per run); measured: the vacuum + both kept reads.
      val table = VtFixtures.freshCopy("vacuum", d) { dir =>
        val orders = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
          .cache()
        try {
          Versioned.commit(s, dir, orders, Some("o_orderkey"), files = 8)
          Versioned.deleteWhereKeyIn(s, dir,
            orders.filter(col("o_orderkey") % 13 === 0).select("o_orderkey"),
            "o_orderkey")
          Versioned.compactCommit(s, dir, targetFiles = 2)
        } finally orders.unpersist(blocking = false)
      }
      Versioned.vacuum(s, table, keepVersions = 2)
      def agg(version: Long) = Versioned.read(s, table, version)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          sum(round(col("o_totalprice") * 100, 0).cast("long"))
            .cast("long").as("total_e2"))
        .withColumn("version", lit(version).cast("long"))
      agg(2L).unionByName(agg(3L))
        .select("version", "o_orderstatus", "cnt", "total_e2")
        .orderBy("version", "o_orderstatus")
    }),

    // q82: SHALLOW CLONE (Versioned.clone = Delta CLONE): branch the
    // table by publishing ONE manifest whose entries reference the
    // source's data files by absolute path — zero data copied, so
    // branching a petabyte table costs a metadata write. A MERGE then
    // lands on the clone only: its new files go under the clone's own
    // data/, and the source's latest snapshot must still equal the
    // pre-clone table — write isolation across the branch point, which
    // is exactly what the two-sided oracle recomputes. Zero-copy and
    // source-file immutability are pinned in VersionedSpec.
    "q82_shallow_clone" -> ((s, d) => {
      // the source commit is the shared base-commit FIXTURE (consumed
      // READ-ONLY — clone manifests reference its files by absolute
      // URI, and the merge lands only under the clone's own data/);
      // measured: the zero-copy clone + the merge + both reads.
      val srcTable = VtFixtures.memo("base3col", d)(buildBase3Col(s, d))
      val dstTable = tmpDir("vt_branch_dst")
      Versioned.clone(s, srcTable, dstTable)
      val orders = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val updates = orders.filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"), lit("C").as("o_orderstatus"),
          (col("o_totalprice") * 2).as("o_totalprice"))
      Versioned.mergeCommit(s, dstTable, updates, Seq("o_orderkey"))
      def agg(side: String, table: String) = Versioned.read(s, table)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          sum(round(col("o_totalprice") * 100, 0).cast("long"))
            .cast("long").as("total_e2"))
        .withColumn("side", lit(side))
      agg("clone", dstTable).unionByName(agg("source", srcTable))
        .select("side", "o_orderstatus", "cnt", "total_e2")
        .orderBy("side", "o_orderstatus")
    }),

    // p02: chunk id + metadata generation (R3 contract shape, flattened
    // for the oracle; the struct form is Retrieval.chunkTable, unit-
    // tested with the books fixture).
    "p02_chunk_ids" -> ((s, d) => {
      val chunkUdf = udf((t: String) => Chunkers.fixedSize(t, 40))
      Tables.documents(s, d)
        .filter(col("doc_id") < 20)
        .select(col("doc_id"), col("source"), chunkUdf(col("text")).as("chunks"))
        .select(col("doc_id"), col("source"),
          posexplode_outer(col("chunks")).as(Seq("pos", "chunk")))
        .filter(col("chunk").isNotNull)
        .select(
          format_string("doc_%d_chunk_%d", col("doc_id"), col("pos")).as("chunk_id"),
          col("doc_id"),
          (col("pos") + 1).cast("long").as("chunk_number"),
          length(col("chunk")).cast("long").as("chunk_len"),
          col("source"))
        .orderBy("doc_id", "chunk_number")
    }),

    // q111: BRANCH / TAG / MERGE on the versioned table (the LakeFS/
    // Iceberg "git for tables" surface — [[graft.sources.Branches]]).
    // v1 is tagged r1 and forked into branch "dev"; the branch takes a
    // full mutation commit (10% cents uplift on %7 keys) while main
    // provably stays at v1 (snapshot pinned BEFORE the merge executes);
    // the fast-forward merge then lands the branch head as main v2 by
    // metadata CAS (expected = fork version — a diverged parent throws
    // instead of silently winning). Four states gate the semantics:
    // main before merge == tag r1 == pristine, dev head == main after.
    "q111_branch_merge" -> ((s, d) => {
      // shares q87's 8-file cents fixture (file-copied per run; tags
      // and branches are created post-copy — they hold absolute URIs);
      // measured: tag, fork, branch commit, merge, and all four reads.
      val table = VtFixtures.freshCopy("cents8", d)(buildCents8(s, d))
      Branches.tag(s, table, "r1")
      Branches.create(s, table, "dev")
      val dev = Branches.root(table, "dev")
      val uplifted = Versioned.read(s, dev)
        .withColumn("cents", when(col("o_orderkey") % 7 === 0,
          col("cents") + expr("cents div 10")).otherwise(col("cents")))
      Versioned.commit(s, dev, uplifted, Some("o_orderkey"), files = 8,
        expected = Some(1L), op = "UPLIFT")
      def agg(side: String, df: DataFrame) = df
        .agg(count(lit(1)).as("cnt"), sum("cents").cast("long").as("cents_sum"))
        .select(lit(side).as("side"), col("cnt"), col("cents_sum"))
      // reads resolve their manifest EAGERLY: these pin their versions
      // here, before the merge below lands — snapshot isolation is the
      // thing under test
      val mainBefore = agg("main_before", Versioned.read(s, table))
      val devHead = agg("dev_head", Branches.read(s, table, "dev"))
      Branches.merge(s, table, "dev")
      val mainAfter = agg("main_after", Versioned.read(s, table))
      val tagged = agg("tag_r1", Branches.readTag(s, table, "r1"))
      mainBefore.unionByName(devHead).unionByName(mainAfter)
        .unionByName(tagged).orderBy("side")
    }),

    // q113: MULTI-TABLE ATOMIC COMMIT ([[graft.sources.Repo]]) — one
    // logical change spanning a fact table AND its aggregate: each
    // transaction lands both table commits, then flips ONE repo
    // pointer; a reader resolving a repo version gets both tables
    // pinned consistently (the gate recomputes the aggregate from the
    // pinned facts and emits both side by side — any torn read would
    // split the columns). Repo v1 stays readable after v2 lands.
    "q113_repo_txn" -> ((s, d) => {
      // the two published repo transactions are the FIXTURE (built
      // once, consumed READ-ONLY); measured: the two pinned-pointer
      // cross-table reads that prove atomicity.
      val repo = VtFixtures.memo("repo_txn", d) { dir =>
        val facts = Repo.tableRoot(dir, "facts")
        val aggT = Repo.tableRoot(dir, "agg")
        val base = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderstatus"),
            round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
        def summarize(df: DataFrame) = df.groupBy("o_orderstatus")
          .agg(count(lit(1)).as("cnt"),
            sum("cents").cast("long").as("cents_sum"))
        // txn 1: facts + aggregate land, then ONE pointer publishes both
        Versioned.commit(s, facts, base, Some("o_orderkey"), files = 4)
        Versioned.commit(s, aggT, summarize(base), None, files = 1)
        Repo.commit(s, dir, Map("facts" -> 1L, "agg" -> 1L), expected = 0L)
        // txn 2: GDPR-style delete restated in BOTH tables atomically
        val kept = base.filter(col("o_orderkey") % 11 =!= 0)
        Versioned.commit(s, facts, kept, Some("o_orderkey"), files = 4)
        Versioned.commit(s, aggT, summarize(kept), None, files = 1)
        Repo.commit(s, dir, Map("facts" -> 2L, "agg" -> 2L), expected = 1L)
      }
      def summarize(df: DataFrame) = df.groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), sum("cents").cast("long").as("cents_sum"))
      def stateAt(rv: Long): DataFrame =
        summarize(Repo.read(s, repo, "facts", rv))
          .withColumnRenamed("cnt", "cnt_facts")
          .withColumnRenamed("cents_sum", "cents_facts")
          .join(Repo.read(s, repo, "agg", rv)
            .withColumnRenamed("cnt", "cnt_agg")
            .withColumnRenamed("cents_sum", "cents_agg"), "o_orderstatus")
          .select(lit(rv).as("repo_v"), col("o_orderstatus"),
            col("cnt_facts"), col("cnt_agg"),
            col("cents_facts"), col("cents_agg"))
      stateAt(1L).unionByName(stateAt(2L)).orderBy("repo_v", "o_orderstatus")
    }),

    // q114: BRANCH-STAGED WRITE-AUDIT-PROMOTE — the git-flow twin of
    // q101/st22's staged WAP: risky ingest lands on a BRANCH (full
    // table semantics, parent invisible), the audit queries the branch
    // head, and promotion IS the fast-forward merge — rejection is a
    // branch drop that provably leaves the parent untouched. Flow:
    // a dirty batch (5 negative-cents rows) stages, fails audit, drops;
    // the cleaned batch stages, passes, merges. Three gated states:
    // the audit count, the parent after rejection (pristine), the
    // parent after promotion (base + clean rows).
    "q114_branch_wap" -> ((s, d) => {
      // the 4-file base commit is the FIXTURE (file-copied per run —
      // branches must be created post-copy, they hold absolute URIs);
      // measured: both stage/audit cycles, the drop, and the merge.
      val table = VtFixtures.freshCopy("bwap", d) { dir =>
        Versioned.commit(s, dir, Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderstatus"),
            round(col("o_totalprice") * 100, 0).cast("long").as("cents")),
          Some("o_orderkey"), files = 4)
      }
      def batch = s.range(1, 51)
        .select((col("id") + 10000000L).as("o_orderkey"),
          lit("N").as("o_orderstatus"),
          when(col("id") % 10 === 0, lit(-100L))
            .otherwise(col("id") * 10).cast("long").as("cents"))
      def agg(step: String, df: DataFrame) = df
        .agg(count(lit(1)).as("cnt"), sum("cents").cast("long").as("cents_sum"))
        .select(lit(step).as("step"), col("cnt"), col("cents_sum"))
      // attempt 1: stage dirty, audit, REJECT
      Branches.create(s, table, "ingest")
      Versioned.appendCommit(s, Branches.root(table, "ingest"), batch,
        Some("o_orderkey"), files = 1)
      // the audit MATERIALIZES before the drop deletes the staged files
      // (driver-side control flow — this is the WAP gate decision)
      val a = Branches.read(s, table, "ingest").filter(col("cents") < 0)
        .agg(count(lit(1)).as("c"),
          coalesce(sum("cents"), lit(0L)).cast("long").as("s")).head()
      val audit = s.range(1).select(lit("audit_dirty").as("step"),
        lit(a.getLong(0)).as("cnt"), lit(a.getLong(1)).as("cents_sum"))
      Branches.drop(s, table, "ingest", force = true)
      val afterReject = agg("state_after_reject", Versioned.read(s, table))
      // attempt 2: stage clean, audit passes, PROMOTE
      Branches.create(s, table, "ingest2")
      Versioned.appendCommit(s, Branches.root(table, "ingest2"),
        batch.filter(col("cents") >= 0), Some("o_orderkey"), files = 1)
      require(Branches.read(s, table, "ingest2")
        .filter(col("cents") < 0).isEmpty, "clean batch must pass audit")
      Branches.merge(s, table, "ingest2")
      val afterPromote = agg("state_after_promote", Versioned.read(s, table))
      audit.unionByName(afterReject).unionByName(afterPromote).orderBy("step")
    }),

    // q115: INCREMENTAL JOIN-VIEW MAINTENANCE — q83 generalized from a
    // single table to a JOIN of two versioned tables, maintained from
    // BOTH change feeds by the bilinear delta rule (DBToaster / Calcite
    // IVM): with ΔA = A₃−A₁ and ΔB = B₂−B₁ as SIGNED multisets,
    //   Δ(A⋈B) = ΔA⋈B₁ + A₁⋈ΔB + ΔA⋈ΔB
    // — three joins whose cost is delta-bound on the fact side: ΔA⋈B₁
    // and ΔA⋈ΔB broadcast the (small) deltas, and A₁⋈ΔB is one
    // broadcast-join SCAN of the old facts (no shuffle; with the facts
    // clustered on the join key, manifest skipping cuts it to the
    // touched key range). Never A⋈B recomputed. Each joined pair
    // contributes sign(a)·sign(b) to cnt and sign·cents to the sum, so
    // dimension-segment churn, fact re-pointing ACROSS dimension keys
    // (the update moves o_custkey), inserts and deletes all flow
    // through one algebra — including the cross term that corrects a
    // moved fact landing on a re-segmented dimension row. The gate
    // emits the maintained view AND a recompute of A₃⋈B₂ under side
    // tags; both must match the same oracle rows, so the delta algebra
    // is proven equal to recompute in-engine AND against DuckDB.
    "q115_incremental_join_view" -> ((s, d) => {
      // fixture memoized per (sf dir, JVM) — READ-ONLY after build, so
      // bench reps time the delta-join maintenance, not five commits
      // (the OrdersMutations precedent)
      val (ta, tb) = JoinMvFixture.tables(s, d)
      locally {
        val a1 = Versioned.read(s, ta, 1)
        val b1 = Versioned.read(s, tb, 1)
        // signed delta relations off the change feeds: −old under
        // update/delete, +new under update/insert (q83's split, with
        // the join key among the signed payload)
        val dAch = Versioned.changes(s, ta, 1, 3, Seq("o_orderkey"))
        val dA = dAch.filter(col("change_type").isin("update", "delete"))
          .select(col("old_o_custkey").as("o_custkey"),
            col("old_cents").as("cents"), lit(-1L).as("ma"))
          .unionByName(dAch.filter(col("change_type").isin("update", "insert"))
            .select(col("new_o_custkey").as("o_custkey"),
              col("new_cents").as("cents"), lit(1L).as("ma")))
        val dBch = Versioned.changes(s, tb, 1, 2, Seq("c_custkey"))
        val dB = dBch.filter(col("change_type").isin("update", "delete"))
          .select(col("c_custkey"), col("old_segment").as("segment"),
            lit(-1L).as("mb"))
          .unionByName(dBch.filter(col("change_type").isin("update", "insert"))
            .select(col("c_custkey"), col("new_segment").as("segment"),
              lit(1L).as("mb")))
        def contribs(facts: DataFrame, dim: DataFrame) = facts
          .join(dim, facts("o_custkey") === dim("c_custkey"))
          .select(col("segment"), (col("ma") * col("mb")).as("w"),
            (col("ma") * col("mb") * col("cents")).as("wc"))
        // ΔA⋈B₁ + A₁⋈ΔB + ΔA⋈ΔB — deltas broadcast, facts never shuffled
        val delta = contribs(broadcast(dA), b1.withColumn("mb", lit(1L)))
          .unionByName(contribs(a1.withColumn("ma", lit(1L)), broadcast(dB)))
          .unionByName(contribs(broadcast(dA), broadcast(dB)))
          .groupBy("segment")
          .agg(sum("w").as("dc"), sum("wc").as("dp"))
        val view1 = a1.join(b1, a1("o_custkey") === b1("c_custkey"))
          .groupBy("segment")
          .agg(count(lit(1)).as("cnt"), sum("cents").cast("long").as("cents_sum"))
        val incremental = view1.join(delta, Seq("segment"), "full_outer")
          .select(col("segment"),
            (coalesce(col("cnt"), lit(0L)) + coalesce(col("dc"), lit(0L)))
              .cast("long").as("cnt"),
            (coalesce(col("cents_sum"), lit(0L)) + coalesce(col("dp"), lit(0L)))
              .cast("long").as("cents_sum"))
          .filter(col("cnt") > 0)
          .withColumn("side", lit("incremental"))
        val recompute = Versioned.read(s, ta, 3)
          .join(Versioned.read(s, tb, 2), col("o_custkey") === col("c_custkey"))
          .groupBy("segment")
          .agg(count(lit(1)).as("cnt"), sum("cents").cast("long").as("cents_sum"))
          .withColumn("side", lit("recompute"))
        incremental.unionByName(recompute)
          .select("side", "segment", "cnt", "cents_sum")
          .orderBy("side", "segment")
      }
    }),

    // q117: CHERRY-PICK across branches — the git/Nessie operation the
    // branch layer (q111) plus the change feed (q74) makes one call:
    // port ONE parent commit onto a fork without merging the rest of
    // parent history. The branch forks at v1; the parent then lands a
    // price-fix merge (v2) AND an unrelated delete (v3);
    // Versioned.cherryPick(parent, 2, branch) applies ONLY v2's delta
    // (op-coded change feed through the MERGE grammar, O(|delta|) +
    // one target pass) to the fork. The gate emits branch and parent
    // head states side-tagged: the branch must show the fix but NOT
    // the delete — exactly the divergence cherry-pick exists to
    // create. Idempotency (txn replay) is pinned in
    // CherryPickRevertSpec.
    "q117_cherry_pick" -> ((s, d) => {
      // parent history (v1 base, v2 price-fix merge, v3 unrelated
      // delete) is the FIXTURE; per run it is file-copied and the
      // branch forks at v1 on the copy (branch create is metadata-only
      // and must happen post-copy — branch manifests hold absolute
      // URIs). The measured operator: cherryPick + the two reads.
      val table = VtFixtures.freshCopy("cherry", d) { dir =>
        val base = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderstatus"),
            round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
          .cache()
        try {
          Versioned.commit(s, dir, base, Some("o_orderkey"))
          Versioned.mergeCommit(s, dir,
            base.filter(col("o_orderkey") % 7 === 0)
              .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
                (col("cents") + 111L).as("cents")),
            Seq("o_orderkey"))
          Versioned.deleteWhereKeyIn(s, dir,
            base.filter(col("o_orderkey") % 11 === 0).select("o_orderkey"),
            "o_orderkey")
        } finally base.unpersist(blocking = false)
      }
      Branches.create(s, table, "fix", fromVersion = 1L)
      Versioned.cherryPick(s, table, 2, Branches.root(table, "fix"),
        "o_orderkey")
      def agg(side: String, df: DataFrame) = df
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), sum("cents").cast("long").as("cents_sum"))
        .withColumn("side", lit(side))
      agg("branch", Branches.read(s, table, "fix"))
        .unionByName(agg("parent", Versioned.read(s, table)))
        .select("side", "o_orderstatus", "cnt", "cents_sum")
        .orderBy("side", "o_orderstatus")
    }),

    // q118: REVERT — undo ONE commit without rewinding history (the
    // operation RESTORE is not): v2's merge (updates + inserts) is
    // surgically subtracted at the head AFTER v3's unrelated delete
    // already landed. Row-level inverse-delta semantics, stated in
    // the API doc: v2's inserts are deleted, its updates restore base
    // values — re-inserting the %77 keys v3 deleted (reverting an
    // update to a later-deleted row brings the old row back; a
    // three-way conflict model is git's job, not a table format's).
    // Final population = base with the non-%7 %11 keys deleted —
    // every other v2 effect is gone, v3's effect on untouched keys
    // stays. History-intact (op=REVERT, 4 versions) is pinned in
    // CherryPickRevertSpec.
    "q118_revert" -> ((s, d) => {
      // the 3-version history is the FIXTURE (file-copied per run);
      // the measured operator is the revert + the head read.
      val table = VtFixtures.freshCopy("revert", d) { dir =>
        val base = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderstatus"),
            round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
          .cache()
        try {
          Versioned.commit(s, dir, base, Some("o_orderkey"))
          val updates = base.filter(col("o_orderkey") % 7 === 0)
            .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
              (col("cents") + 111L).as("cents"))
          val inserts = base.filter(col("o_orderkey") % 13 === 0)
            .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
              lit("N").as("o_orderstatus"), expr("cents div 2").as("cents"))
          Versioned.mergeCommit(s, dir, updates.unionByName(inserts),
            Seq("o_orderkey"))
          Versioned.deleteWhereKeyIn(s, dir,
            base.filter(col("o_orderkey") % 11 === 0).select("o_orderkey"),
            "o_orderkey")
        } finally base.unpersist(blocking = false)
      }
      Versioned.revert(s, table, 2, "o_orderkey")
      Versioned.read(s, table)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), sum("cents").cast("long").as("cents_sum"))
        .orderBy("o_orderstatus")
    }),

    // q119: COLUMN DEFAULTS — ALTER ADD COLUMN with an initial default
    // as a METADATA-ONLY commit (Iceberg initial-default / Delta ALTER
    // ADD COLUMN): zero data files rewritten at any table size; every
    // pre-add file entry is stamped, and the read paths substitute the
    // default for exactly those files — so the three populations this
    // gate distinguishes are (a) pre-add rows reading 'std' they never
    // stored, (b) post-add rows storing an EXPLICIT NULL that stays
    // NULL (the case a bare coalesce would corrupt), (c) a post-add
    // append OMITTING the column entirely, materialized at write time
    // (write-default). Stamp mechanics, both-read-path agreement, and
    // skipping through the era-grouped scan are pinned in
    // ColumnDefaultsSpec.
    "q119_column_defaults" -> ((s, d) => {
      // the add-column + mixed-era append history is the FIXTURE
      // (built once, consumed READ-ONLY); measured: the default-
      // substituting read across the three schema eras.
      val table = VtFixtures.memo("coldef", d) { dir =>
        val base = Tables.orders(s, d).select(col("o_orderkey"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
        Versioned.commit(s, dir, base, Some("o_orderkey"), files = 8)
        Versioned.addColumn(s, dir, "tier", "string", Some("'std'"))
        Versioned.appendCommit(s, dir,
          base.filter(col("o_orderkey") % 19 === 0)
            .select((col("o_orderkey") + 30000000L).as("o_orderkey"),
              expr("cents div 3").as("cents"),
              when(col("o_orderkey") % 2 === 0, lit("pro")).as("tier")),
          Some("o_orderkey"), files = 2)
        Versioned.appendCommit(s, dir,
          base.filter(col("o_orderkey") % 23 === 0)
            .select((col("o_orderkey") + 40000000L).as("o_orderkey"),
              expr("cents div 5").as("cents")),
          Some("o_orderkey"), files = 2)
      }
      Versioned.read(s, table)
        .groupBy("tier")
        .agg(count(lit(1)).as("cnt"), sum("cents").cast("long").as("cents_sum"))
        .orderBy("tier")
    }),

    // q120: IDENTITY COLUMN — Delta's GENERATED ALWAYS AS IDENTITY on
    // the commit log: setIdentity declares the column metadata-only,
    // then every append assigns DENSE ids from the manifest's
    // high-water mark (batch ordered by the commit key — deterministic)
    // and advances the mark atomically with the append's own CAS, so
    // concurrent appends can never mint overlapping ranges (the loser
    // rebases into a conflict and re-runs with fresh ids). The gate
    // emits the full id→key mapping across two appends; the oracle
    // recomputes it as per-batch row_numbers with the second batch
    // offset by the first's count. ALWAYS refusal, mark survival
    // across OPTIMIZE, and pre-identity NULLs are pinned in
    // IdentitySpec.
    "q120_identity_column" -> ((s, d) => {
      // the identity-stamped 2-append history is the FIXTURE (built
      // once, consumed READ-ONLY); measured: the id→key mapping read.
      val table = VtFixtures.memo("ident", d) { dir =>
        val base = Tables.orders(s, d).select(col("o_orderkey"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
        Versioned.commit(s, dir, base.limit(0), Some("o_orderkey"), files = 1)
        Versioned.setIdentity(s, dir, "row_id")
        Versioned.appendCommit(s, dir,
          base.filter(col("o_orderkey") % 19 === 0)
            .select((col("o_orderkey") + 30000000L).as("o_orderkey"),
              col("cents")),
          Some("o_orderkey"), files = 2)
        Versioned.appendCommit(s, dir,
          base.filter(col("o_orderkey") % 23 === 0)
            .select((col("o_orderkey") + 40000000L).as("o_orderkey"),
              col("cents")),
          Some("o_orderkey"), files = 2)
      }
      Versioned.read(s, table)
        .select(col("row_id"), col("o_orderkey"))
        .orderBy("row_id")
    }),

    // q121: ROW TRACKING (Delta row tracking / Iceberg row lineage) —
    // the manifest stamps each data file with a baseRowId off the
    // table's monotone high-water mark at publication, so `_row_id` =
    // base + `_metadata.row_index` is assigned with ZERO data rewrite
    // and stays stable for every commit that carries the file by
    // reference. Unlike q120's identity column (a materialized USER
    // column computed at append), row ids live entirely in metadata:
    // pre-existing tables get them on their next rewrite, and the read
    // adds one broadcast map-join of the O(files) manifest — no
    // shuffle, no extra scan. The gate: three appends; v3's ids must
    // be unique and dense over [0, N); every v2 row must keep its id
    // in v3 (moved_ids = 0 — the stability contract). The oracle
    // recomputes the populations from orders; the invariant columns
    // are exact by construction.
    "q121_row_tracking" -> ((s, d) => {
      // the 3-append history is the FIXTURE (built once, consumed
      // READ-ONLY — row ids live in the manifests, both versions stay
      // addressable); measured: the two row-id reads + stability join.
      val table = VtFixtures.memo("rowtrack", d) { dir =>
        val base = Tables.orders(s, d).select(col("o_orderkey"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
        Versioned.commit(s, dir, base.filter(col("o_orderkey") % 3 === 0),
          Some("o_orderkey"), files = 3)
        Versioned.appendCommit(s, dir, base.filter(col("o_orderkey") % 3 === 1),
          Some("o_orderkey"), files = 3)
        Versioned.appendCommit(s, dir, base.filter(col("o_orderkey") % 3 === 2),
          Some("o_orderkey"), files = 3)
      }
      val v2 = Versioned.readWithRowIds(s, table, 2)
      val v3 = Versioned.readWithRowIds(s, table, 3)
      val stability = v2.select(col("o_orderkey"), col("_row_id").as("id2"))
        .join(v3.select(col("o_orderkey"), col("_row_id").as("id3")),
          "o_orderkey")
        .agg(count(lit(1)).as("carried_rows"),
          sum(when(col("id2") === col("id3"), 0L).otherwise(1L))
            .cast("long").as("moved_ids"))
      v3.agg(count(lit(1)).as("n_rows"),
          countDistinct(col("_row_id")).as("n_ids"),
          min("_row_id").cast("long").as("min_id"),
          max("_row_id").cast("long").as("max_id"))
        .crossJoin(broadcast(stability))
        .select("n_rows", "n_ids", "min_id", "max_id",
          "carried_rows", "moved_ids")
    }),

    // q122: SNAPSHOT EXPORT for engines that don't speak the commit
    // log (Delta's GENERATE symlink_format_manifest / Iceberg's
    // register-table path). A PLAIN snapshot exports as a manifest of
    // absolute file URIs — ZERO bytes moved, and since data files are
    // immutable the export stays a consistent view after later
    // commits (the gate DV-deletes a fifth of the source AFTER
    // exporting and must still read the full v1). A snapshot whose
    // logical view differs from its raw bytes (here: a DV to subtract
    // and a renamed column) MATERIALIZES the logical read as plain
    // parquet — the only form an external reader gets right. Both
    // exports are read back exactly as an external engine would.
    "q122_snapshot_export" -> ((s, d) => {
      val base = Tables.orders(s, d).select(col("o_orderkey"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      // plain side MUTATES post-export (the isolation proof) — its
      // 4-file commit is a file-copied FIXTURE; the MoR side is
      // consumed READ-ONLY by its export, so its whole rename + DV
      // history memoizes. Measured: both exports, the post-export
      // delete, and both external-style reads.
      val plainT = VtFixtures.freshCopy("exp_plain", d) { dir =>
        Versioned.commit(s, dir, base, Some("o_orderkey"), files = 4)
      }
      val plainOut = tmpDir("vt_exp_p_out")
      val (_, mat1) = Versioned.exportSnapshot(s, plainT, plainOut)
      // post-export mutation: the symlink export must not see it
      Versioned.deleteMergeOnRead(s, plainT,
        base.filter(col("o_orderkey") % 5 === 0).select("o_orderkey"),
        "o_orderkey")
      val morT = VtFixtures.memo("exp_mor", d) { dir =>
        Versioned.commit(s, dir, base, Some("o_orderkey"), files = 4)
        Versioned.renameColumn(s, dir, "cents", "price_cents")
        Versioned.deleteMergeOnRead(s, dir,
          base.filter(col("o_orderkey") % 5 === 0).select("o_orderkey"),
          "o_orderkey")
      }
      val morOut = tmpDir("vt_exp_m_out")
      val (_, mat2) = Versioned.exportSnapshot(s, morT, morOut)
      def shape(side: String, df: DataFrame, cents: String,
          mat: Boolean) = df
        .agg(count(lit(1)).as("cnt"),
          sum(col(cents)).cast("long").as("cents_sum"))
        .select(lit(side).as("side"), col("cnt"), col("cents_sum"),
          lit(if (mat) 1 else 0).as("materialized"))
      shape("mor", Versioned.readExport(s, morOut), "price_cents", mat2)
        .unionByName(
          shape("plain", Versioned.readExport(s, plainOut), "cents", mat1))
        .orderBy("side")
    }),

    // q123: AUTO COMPACTION on the write path (Delta autoCompact) —
    // trickle ingest (6 one-file appends) with a low trigger: the 4th
    // append crosses `minSmallFiles` and fires ONE follow-on OPTIMIZE
    // binpack commit (appends 5–6 stay under the trigger), so the
    // table ends at exactly 3 files with one OPTIMIZE in its history —
    // the deterministic layout invariant the literal columns pin. The
    // oracle recomputes the data aggregates from orders; layout
    // invariants are exact by the trigger arithmetic.
    "q123_auto_compact" -> ((s, d) => {
      val table = tmpDir("vt_autocompact")
      val base = Tables.orders(s, d).select(col("o_orderkey"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      (0 until 6).foreach { i =>
        Versioned.appendWithAutoCompact(s, table,
          base.filter(col("o_orderkey") % 6 === i),
          Some("o_orderkey"), files = 1,
          targetBytes = 256L << 20, minSmallFiles = 4)
      }
      val snap = Versioned.snapshot(s, table)
      val optimizes = Versioned.history(s, table)
        .filter(col("operation") === "OPTIMIZE").count()
      Versioned.read(s, table)
        .agg(count(lit(1)).as("cnt"),
          sum("cents").cast("long").as("cents_sum"))
        .select(col("cnt"), col("cents_sum"),
          lit(snap.files.size).as("n_files"),
          lit(optimizes.toInt).as("n_optimize"))
    }),

    // q127: CHANGE FEED through the format door —
    // read.format("graft").option("readChangeFeed", true) with Delta's
    // startingVersion semantics: version 1 is INCLUSIVE, so the
    // table's creation surfaces as inserts (the case a version-pair
    // diff walk can't express). Same event algebra as q74 (shared
    // fixture, shared oracle derivation) plus the creation block —
    // proving the stock DataFrame API needs no graft imports to
    // consume CDC.
    "q127_cdf_format_door" -> ((s, d) => {
      val table = OrdersMutations.table(s, d)
      s.read.format("graft")
        .option("readChangeFeed", "true").option("startingVersion", "1")
        .load(table)
        .groupBy(col("version").cast("long").as("version"), col("change_type"))
        .agg(count(lit(1)).as("cnt"),
          sum(round((coalesce(col("new_o_totalprice"), lit(0.0)) -
            coalesce(col("old_o_totalprice"), lit(0.0))) * 100, 0).cast("long"))
            .cast("long").as("delta_e2"))
        .orderBy("version", "change_type")
    }),

    // q128: METADATA-ONLY COUNT(*) as a Catalyst OPTIMIZER RULE
    // ([[graft.plans.MetadataOnlyCount]], injected via
    // GraftExtensions — Delta's OptimizeMetadataOnlyQuery): plain SQL
    // `count(*)` over a versioned scan collapses to the manifest's
    // precomputed row sum — zero files opened, zero tasks, at any
    // table size (the rewrite-to-LocalRelation is pinned in
    // MetadataOnlyCountSpec). The filtered count alongside proves the
    // rule declines when a Filter sits between: that one scans.
    // q97's metaCount is the same arithmetic as an explicit API; this
    // gives it to users who only ever write SQL.
    "q128_metadata_count" -> ((s, d) => {
      val table = tmpDir("vt_metarule")
      Versioned.commit(s, table,
        Tables.orders(s, d).select(col("o_orderkey"), col("o_orderstatus")),
        Some("o_orderkey"), files = 4)
      val n = s.sql("SELECT count(*) AS n, min(o_orderkey) AS min_key, " +
        s"max(o_orderkey) AS max_key FROM graft_table('$table')")
      val nf = s.sql(s"SELECT count(*) AS n_filtered " +
        s"FROM graft_table('$table') WHERE o_orderkey % 2 = 0")
      n.crossJoin(broadcast(nf))
    }),

    // q129: the DSv2 CATALOG door ([[graft.sources.GraftCatalog]]) —
    // the whole lifecycle in pure SQL with catalog-qualified names:
    // CREATE TABLE graft.t TBLPROPERTIES('key') pins the clustered
    // layout, each INSERT INTO lands as one append commit under the
    // CAS (the two inserts mint versions 2 and 3 — VERSION AS OF 2
    // sees only the first half), and SELECT reads the same
    // manifest-backed relation as every other door. Writes ride the
    // V1 fallback bridge (V1Write → appendCommit), so constraints,
    // identity and row tracking apply unchanged — pinned in
    // GraftCatalogSpec. The warehouse is FIXED per JVM (catalog
    // instances cache their options); table names are per-run unique.
    "q129_sql_catalog" -> ((s, d) => {
      val wh = Files.createDirectories(
        Paths.get("target", "pipeline", "graft_wh")).toString
      s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      val t = "t_" + java.util.UUID.randomUUID().toString
        .replace("-", "").take(10)
      s.sql(s"CREATE TABLE graft.$t (o_orderkey BIGINT, cents BIGINT) " +
        "TBLPROPERTIES ('key' = 'o_orderkey')")
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
        .createOrReplaceTempView("cat_src")
      s.sql(s"INSERT INTO graft.$t SELECT * FROM cat_src " +
        "WHERE o_orderkey % 2 = 0")
      s.sql(s"INSERT INTO graft.$t SELECT * FROM cat_src " +
        "WHERE o_orderkey % 2 = 1")
      s.sql(s"""SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS cents_sum,
        (SELECT count(*) FROM graft.$t VERSION AS OF 2) AS v2_rows
        FROM graft.$t""")
    }),

    // q130: pure-SQL DELETE FROM through the DSv2 catalog
    // ([[graft.sources.GraftTable]] implements SupportsDeleteV2):
    // Spark pushes the WHERE clause as V2 predicates, the table
    // translates them back to ONE Catalyst conjunction
    // (V2PredicateTranslator — comparisons, boolean algebra, IN and
    // arithmetic like the %13 here), and [[Versioned.deleteWhereExpr]]
    // executes it as a stats-pruned copy-on-write commit: files whose
    // per-column manifest stats provably exclude a match carry by
    // reference, matched files are read through DV+defaults+mapping
    // and rewritten minus the TRUE rows (FALSE and NULL survive — SQL
    // DELETE's three-valued contract). History stays intact: the
    // pre-delete version remains readable, pinned by the scalar
    // subquery. The oracle recomputes the survivor aggregate from
    // orders with the negated predicate.
    "q130_sql_delete" -> ((s, d) => {
      val wh = Files.createDirectories(
        Paths.get("target", "pipeline", "graft_wh")).toString
      s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      // the populated 3-col table is the FIXTURE (shared by q130/q132/
      // q133; file-copied under a fresh catalog name per run — a table
      // IS its warehouse dir); measured: the SQL DELETE + reads.
      val t = "t_" + java.util.UUID.randomUUID().toString
        .replace("-", "").take(10)
      VtFixtures.copy(sqlCentsFixture(s, d, wh), s"$wh/$t")
      s.sql(s"DELETE FROM graft.$t WHERE o_orderkey % 13 = 0 " +
        "OR (o_orderkey <= 1500 AND o_orderstatus = 'F')")
      s.sql(s"""SELECT o_orderstatus, count(*) AS cnt,
        CAST(sum(cents) AS BIGINT) AS cents_sum,
        (SELECT count(*) FROM graft.$t VERSION AS OF 2) AS pre_delete_rows
        FROM graft.$t GROUP BY o_orderstatus ORDER BY o_orderstatus""")
    }),

    // q131: pure-SQL ALTER TABLE over the catalog — every change is a
    // METADATA-ONLY versioned commit, zero data I/O at any table size:
    // ADD COLUMN (manifest schema + noCols stamps), RENAME COLUMN
    // (column-mapping indirection), ALTER COLUMN TYPE int->bigint
    // (read-time widening upcast), DROP COLUMN (mapping removal; the
    // physical bytes stay until a rewrite). Phase-1 rows (narrow int,
    // no cents) and post-DDL phase-2 rows (wide, with cents) read back
    // through ONE logical schema; the oracle rebuilds the same final
    // state from orders.
    "q131_sql_alter" -> ((s, d) => {
      val wh = Files.createDirectories(
        Paths.get("target", "pipeline", "graft_wh")).toString
      s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      // the populated pre-evolution table is the FIXTURE (file-copied
      // per run); measured: the four metadata-only ALTERs + the
      // post-evolution insert + the mapped read.
      val t = "t_" + java.util.UUID.randomUUID().toString
        .replace("-", "").take(10)
      val altFix = VtFixtures.memoVal[String]("sql_alter_fix", d) {
        val ft = "fixalt_" + sqlFixtureSuffix(d)
        // a leftover under this (jvm, sf dir)-scoped name can only be
        // this JVM's own half-built fixture (the build threw after
        // CREATE); drop it so the retry starts clean
        s.sql(s"DROP TABLE IF EXISTS graft.$ft")
        s.sql(s"CREATE TABLE graft.$ft (o_orderkey BIGINT, pr INT, " +
          "junk STRING) TBLPROPERTIES ('key' = 'o_orderkey')")
        Tables.orders(s, d)
          .select(col("o_orderkey"),
            substring(col("o_orderpriority"), 1, 1).cast("int").as("pr"),
            col("o_orderstatus").as("junk"),
            round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
          .createOrReplaceTempView("alter_src")
        s.sql(s"INSERT INTO graft.$ft " +
          "SELECT o_orderkey, pr, junk FROM alter_src WHERE o_orderkey % 2 = 0")
        s"$wh/$ft"
      }
      VtFixtures.copy(altFix, s"$wh/$t")
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          substring(col("o_orderpriority"), 1, 1).cast("int").as("pr"),
          col("o_orderstatus").as("junk"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
        .createOrReplaceTempView("alter_src")
      s.sql(s"ALTER TABLE graft.$t ADD COLUMN cents BIGINT")
      s.sql(s"ALTER TABLE graft.$t RENAME COLUMN pr TO prio")
      s.sql(s"ALTER TABLE graft.$t ALTER COLUMN prio TYPE BIGINT")
      s.sql(s"ALTER TABLE graft.$t DROP COLUMN junk")
      s.sql(s"INSERT INTO graft.$t " +
        "SELECT o_orderkey, CAST(pr AS BIGINT), cents FROM alter_src " +
        "WHERE o_orderkey % 2 = 1")
      s.sql(s"""SELECT prio, count(*) AS cnt,
        CAST(sum(coalesce(cents, -5)) AS BIGINT) AS cents_sum,
        CAST(sum(o_orderkey) AS BIGINT) AS key_sum
        FROM graft.$t GROUP BY prio ORDER BY prio""")
    }),

    // q132: pure-SQL UPDATE — [[graft.plans.GraftDmlRewrite]] turns the
    // resolved UpdateTable node into a RunnableCommand running
    // [[Versioned.updateWhere]]: one stats-pruned copy-on-write commit
    // (files the predicate provably misses carry by reference — same
    // manifest split as DELETE), assignments evaluated simultaneously
    // against the old row, unassigned generated columns recomputed.
    // The oracle rebuilds the post-update state with a CASE projection.
    "q132_sql_update" -> ((s, d) => {
      val wh = Files.createDirectories(
        Paths.get("target", "pipeline", "graft_wh")).toString
      s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      // shared SQL fixture (see sqlCentsFixture); measured: the SQL
      // UPDATE + the read.
      val t = "t_" + java.util.UUID.randomUUID().toString
        .replace("-", "").take(10)
      VtFixtures.copy(sqlCentsFixture(s, d, wh), s"$wh/$t")
      s.sql(s"UPDATE graft.$t SET cents = cents * 2, o_orderstatus = 'X' " +
        "WHERE o_orderkey % 5 = 0 AND cents > 1000000")
      s.sql(s"""SELECT o_orderstatus, count(*) AS cnt,
        CAST(sum(cents) AS BIGINT) AS cents_sum
        FROM graft.$t GROUP BY o_orderstatus ORDER BY o_orderstatus""")
    }),

    // q133: pure-SQL MERGE INTO — the rewrite plans
    // [[Versioned.mergeInto]], Delta's two-pass design as ONE atomic
    // commit: pass 1 finds files holding a match (inner join, file
    // names to the driver — O(files)), pass 2 rewrites exactly those
    // through the first-match-wins action cascade (conditional UPDATE,
    // unconditional DELETE fallback) and appends the NOT MATCHED
    // inserts from one anti-join; untouched files carry by reference
    // and a multi-match source is refused. The oracle composes the
    // same cascade as a CASE projection + UNION.
    "q133_sql_merge" -> ((s, d) => {
      val wh = Files.createDirectories(
        Paths.get("target", "pipeline", "graft_wh")).toString
      s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      // shared SQL fixture (see sqlCentsFixture); measured: the
      // 3-branch SQL MERGE + the read.
      val t = "t_" + java.util.UUID.randomUUID().toString
        .replace("-", "").take(10)
      VtFixtures.copy(sqlCentsFixture(s, d, wh), s"$wh/$t")
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
        .createOrReplaceTempView("mrg_base")
      s.sql("""SELECT o_orderkey AS k, cents FROM mrg_base
        WHERE o_orderkey % 7 = 0
        UNION ALL
        SELECT o_orderkey + 10000000 AS k, cents FROM mrg_base
        WHERE o_orderkey % 13 = 0""").createOrReplaceTempView("mrg_src")
      s.sql(
        s"""MERGE INTO graft.$t AS t USING mrg_src AS s ON t.o_orderkey = s.k
           |WHEN MATCHED AND s.cents % 2 = 0 THEN
           |  UPDATE SET cents = s.cents * 3, o_orderstatus = 'M'
           |WHEN MATCHED THEN DELETE
           |WHEN NOT MATCHED THEN
           |  INSERT (o_orderkey, o_orderstatus, cents) VALUES (s.k, 'N', s.cents)
           |""".stripMargin)
      s.sql(s"""SELECT o_orderstatus, count(*) AS cnt,
        CAST(sum(cents) AS BIGINT) AS cents_sum
        FROM graft.$t GROUP BY o_orderstatus ORDER BY o_orderstatus""")
    }),

    // q139: pure-SQL MERGE WITH SCHEMA EVOLUTION — the source carries
    // a column the target has never seen (o_priority) AND a column the
    // target holds at a NARROWER type (cents: INT target, BIGINT
    // source with values past 2^31). The table's
    // AUTOMATIC_SCHEMA_EVOLUTION capability lets Spark 4's stock
    // ResolveMergeIntoSchemaEvolution compute the AddColumn change and
    // push it through GraftCatalog.alterTable (the same metadata-only
    // ADD COLUMN commit as explicit DDL) before the merge resolves;
    // the TYPE-WIDENING half (which stock evolution never emits) runs
    // through Versioned.widenForMerge — the q131 metadata-only widen
    // commit — before the merge aligns assignments, so the over-range
    // update values land instead of CAST_OVERFLOWing. Zero files
    // touched by either evolution commit; untouched target rows read
    // null for the new column ('none' bucket), matched rows get the
    // update-fill ('HI'), inserts the insert-fill ('NEW'), so all
    // three fill paths are distinguished by the gate (the SQL twin of
    // the library-level q98).
    "q139_sql_merge_schema_evolution" -> ((s, d) => {
      val wh = Files.createDirectories(
        Paths.get("target", "pipeline", "graft_wh")).toString
      s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      // the populated NARROW-typed (INT cents) table is the FIXTURE
      // (file-copied per run); measured: the evolving merge — the
      // AddColumn + widen commits plus the aligned merge itself.
      val t = "t_" + java.util.UUID.randomUUID().toString
        .replace("-", "").take(10)
      val evFix = VtFixtures.memoVal[String]("sql_ev_int", d) {
        val ft = "fixev_" + sqlFixtureSuffix(d)
        // a leftover under this (jvm, sf dir)-scoped name can only be
        // this JVM's own half-built fixture (the build threw after
        // CREATE); drop it so the retry starts clean
        s.sql(s"DROP TABLE IF EXISTS graft.$ft")
        s.sql(s"CREATE TABLE graft.$ft (o_orderkey BIGINT, " +
          "o_orderstatus STRING, cents INT) " +
          "TBLPROPERTIES ('key' = 'o_orderkey')")
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderstatus"),
            round(col("o_totalprice") * 100, 0).cast("int").as("cents"))
          .createOrReplaceTempView("ev_base")
        s.sql(s"INSERT INTO graft.$ft SELECT * FROM ev_base")
        s"$wh/$ft"
      }
      VtFixtures.copy(evFix, s"$wh/$t")
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"),
          round(col("o_totalprice") * 100, 0).cast("int").as("cents"))
        .createOrReplaceTempView("ev_base")
      s.sql("""SELECT o_orderkey AS k,
        CAST(cents AS BIGINT) * 300000 AS cents,
        'HI' AS o_priority FROM ev_base WHERE o_orderkey % 7 = 0
        UNION ALL
        SELECT o_orderkey + 10000000 AS k, cents, 'NEW' AS o_priority
        FROM ev_base WHERE o_orderkey % 13 = 0""")
        .createOrReplaceTempView("ev_src")
      s.sql(
        s"""MERGE WITH SCHEMA EVOLUTION INTO graft.$t AS t
           |USING ev_src AS s ON t.o_orderkey = s.k
           |WHEN MATCHED THEN
           |  UPDATE SET cents = s.cents, o_priority = s.o_priority
           |WHEN NOT MATCHED THEN
           |  INSERT (o_orderkey, o_orderstatus, cents, o_priority)
           |  VALUES (s.k, 'N', s.cents, s.o_priority)
           |""".stripMargin)
      s.sql(s"""SELECT coalesce(o_priority, 'none') AS prio,
        count(*) AS cnt, count(DISTINCT o_orderkey) AS n_keys,
        CAST(sum(cents) AS BIGINT) AS cents_sum
        FROM graft.$t GROUP BY coalesce(o_priority, 'none')
        ORDER BY prio""")
    }),

    // q142: SQL DOOR FOR THE PERSISTED ANN INDEX — the s15 lifecycle
    // for a SQL-only user: CTAS the embedding corpus into the catalog,
    // `CALL graft.system.ann_ensure(...)` trains + commits the IVF
    // artifacts as versioned tables under the index root's namespace
    // (graft.<root>.ivf_centroids is an ordinary queryable table), a
    // second CALL on the unchanged corpus mints NOTHING (the emitted
    // ensure1_/ensure2_ version columns stay equal — the zero-rebuild
    // contract, visible in the gate output), and serving is the
    // `graft_ann_search` TVF with the probe named BY ROW ID (its
    // embedding is an in-plan 1-row subquery — no vector literal
    // crosses the SQL boundary). Approximate tier → rows-only; the
    // exact incremental/equality laws are AnnIndexSpec's.
    "q142_sql_ann" -> ((s, d) => {
      val wh = Files.createDirectories(
        Paths.get("target", "pipeline", "graft_wh")).toString
      s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      // the CTAS'd embedding corpus is the FIXTURE (built once,
      // consumed READ-ONLY by the ensure CALLs and the TVF); the index
      // root stays per-run, so BOTH ensure CALLs — train + the
      // zero-rebuild re-check — are measured.
      val ix = "ix_" + java.util.UUID.randomUUID().toString
        .replace("-", "").take(10)
      val t = VtFixtures.memoVal[String]("sql_ann_corpus", d) {
        val ft = "fixann_" + sqlFixtureSuffix(d)
        Tables.embeddings(s, d).select("vec_id", "embedding")
          .createOrReplaceTempView("ann_src")
        // see the other fixture builders: clear this JVM's own
        // half-built leftover so a retry starts clean
        s.sql(s"DROP TABLE IF EXISTS graft.$ft")
        s.sql(s"CREATE TABLE graft.$ft TBLPROPERTIES ('key' = 'vec_id') " +
          "AS SELECT * FROM ann_src")
        ft
      }
      def ensure() = s.sql(
        s"""CALL graft.system.ann_ensure(index_root => '$ix',
           |  table => '$t', id_col => 'vec_id', emb_col => 'embedding',
           |  kind => 'ivf', k => 16)""".stripMargin)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val v1 = ensure()
      val v2 = ensure() // unchanged corpus: zero rebuild, same versions
      s.sql(
        s"""SELECT vec_id, round(score, 4) AS cos_sim,
           |  ${v1("ivf_centroids")} AS ensure1_cent_v,
           |  ${v1("ivf_assignments")} AS ensure1_asg_v,
           |  ${v2("ivf_centroids")} AS ensure2_cent_v,
           |  ${v2("ivf_assignments")} AS ensure2_asg_v
           |FROM graft_ann_search('$wh/$ix', '$wh/$t', 'vec_id',
           |  'embedding', 0, 10, 4)
           |ORDER BY cos_sim DESC, vec_id""".stripMargin)
    }),

    // q144: KIND-COMPLETE SQL ANN DOOR — q142's lifecycle for the
    // OTHER two index kinds, so a SQL-only user can ensure AND serve
    // every index ann_ensure can build without dropping to the Scala
    // API: PQ (asymmetric-distance scan over the committed codes +
    // exact rerank — needs the IVF routing ensured first, the
    // documented composite) and HNSW (batch-path graph serve). Both
    // kinds re-CALL ensure on the unchanged corpus and pin the
    // zero-rebuild contract in the emitted version columns; the two
    // TVF calls exercise BOTH optional-tail parses (`..., 4, 'pq'`
    // with nProbe, `..., 'hnsw'` without). Approximate tier →
    // rows-only; equality/recall laws live in AnnIndexSpec/PqAnnSpec.
    "q144_sql_ann_kinds" -> ((s, d) => {
      val wh = Files.createDirectories(
        Paths.get("target", "pipeline", "graft_wh")).toString
      s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      // same read-only corpus fixture as q142. Unlike q142 (which
      // re-trains its cheap IVF per run to measure the ensure), the
      // index root here is MEMOIZED per JVM: training PQ codebooks and
      // a sharded HNSW graph per rep would (a) make the gate measure
      // build throughput that s12/s04 already measure and (b) churn
      // five fresh versioned tables into the warehouse every rep —
      // exactly the build-dir pollution the bench guards against. Run
      // 1 trains; every later run exercises the zero-rebuild re-ensure
      // + serve, the operational steady state (version columns pin it).
      val ix = VtFixtures.memoVal[String]("sql_ann_kinds_ix", d) {
        "kx_" + java.util.UUID.randomUUID().toString.replace("-", "").take(10)
      }
      val t = VtFixtures.memoVal[String]("sql_ann_corpus", d) {
        val ft = "fixann_" + sqlFixtureSuffix(d)
        Tables.embeddings(s, d).select("vec_id", "embedding")
          .createOrReplaceTempView("ann_src")
        s.sql(s"DROP TABLE IF EXISTS graft.$ft")
        s.sql(s"CREATE TABLE graft.$ft TBLPROPERTIES ('key' = 'vec_id') " +
          "AS SELECT * FROM ann_src")
        ft
      }
      def ensure(kind: String) = s.sql(
        s"""CALL graft.system.ann_ensure(index_root => '$ix',
           |  table => '$t', id_col => 'vec_id', emb_col => 'embedding',
           |  kind => '$kind', k => 16, m => 8)""".stripMargin)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      ensure("ivf") // PQ serving routes through the IVF lists
      val p1 = ensure("pq"); val p2 = ensure("pq")
      val h1 = ensure("hnsw"); val h2 = ensure("hnsw")
      s.sql(
        s"""SELECT 'pq' AS kind, vec_id, round(score, 4) AS cos_sim,
           |  ${p1("pq_codes")} AS ensure1_v, ${p2("pq_codes")} AS ensure2_v
           |FROM graft_ann_search('$wh/$ix', '$wh/$t', 'vec_id',
           |  'embedding', 0, 10, 4, 'pq')
           |UNION ALL
           |SELECT 'hnsw' AS kind, vec_id, round(score, 4) AS cos_sim,
           |  ${h1("nsw_edges")} AS ensure1_v, ${h2("nsw_edges")} AS ensure2_v
           |FROM graft_ann_search('$wh/$ix', '$wh/$t', 'vec_id',
           |  'embedding', 0, 10, 'hnsw')
           |ORDER BY kind, cos_sim DESC, vec_id""".stripMargin)
    }),

    // q145: AD-HOC QUERY VECTOR THROUGH THE SQL DOOR — the reference's
    // actual /ask shape (src/api.py:24,32-42: embed an ARBITRARY user
    // question, then search): the probe is a fractional array literal
    // that is NOT a corpus row, served through graft_ann_search for
    // all three kinds. Before this, a SQL-only retrieval session could
    // only probe by existing row id; now the door takes the fresh
    // vector directly (element type disambiguates ids from
    // components), casts it to the corpus embedding type, and rides
    // the exact single-probe plan the by-row form uses — SQL ≡ Scala
    // API is pinned bit-for-bit in SqlTvfSpec, along with the typed
    // NULL-component and width-mismatch errors. Shares q144's
    // memoized index root (run 1 trains, later runs are the warm
    // serving steady state). Approximate tier → rows-only.
    "q145_sql_ann_adhoc" -> ((s, d) => {
      val wh = Files.createDirectories(
        Paths.get("target", "pipeline", "graft_wh")).toString
      s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      val ix = VtFixtures.memoVal[String]("sql_ann_kinds_ix", d) {
        "kx_" + java.util.UUID.randomUUID().toString.replace("-", "").take(10)
      }
      val t = VtFixtures.memoVal[String]("sql_ann_corpus", d) {
        val ft = "fixann_" + sqlFixtureSuffix(d)
        Tables.embeddings(s, d).select("vec_id", "embedding")
          .createOrReplaceTempView("ann_src")
        s.sql(s"DROP TABLE IF EXISTS graft.$ft")
        s.sql(s"CREATE TABLE graft.$ft TBLPROPERTIES ('key' = 'vec_id') " +
          "AS SELECT * FROM ann_src")
        ft
      }
      def ensure(kind: String): Unit = s.sql(
        s"""CALL graft.system.ann_ensure(index_root => '$ix',
           |  table => '$t', id_col => 'vec_id', emb_col => 'embedding',
           |  kind => '$kind', k => 16, m => 8)""".stripMargin).collect()
      ensure("ivf"); ensure("pq"); ensure("hnsw")
      // the question vector: deterministic, corpus-width (64), and not
      // any stored row — exactly what an external embedder would hand
      // the door
      val vec = (0 until 64)
        .map(i => s"CAST(${((i % 7) - 3) * 0.25} AS DOUBLE)")
        .mkString("array(", ", ", ")")
      s.sql(
        s"""SELECT 'ivf' AS kind, vec_id, round(score, 4) AS cos_sim
           |FROM graft_ann_search('$wh/$ix', '$wh/$t', 'vec_id',
           |  'embedding', $vec, 10, 4, 'ivf')
           |UNION ALL
           |SELECT 'pq' AS kind, vec_id, round(score, 4) AS cos_sim
           |FROM graft_ann_search('$wh/$ix', '$wh/$t', 'vec_id',
           |  'embedding', $vec, 10, 4, 'pq')
           |UNION ALL
           |SELECT 'hnsw' AS kind, vec_id, round(score, 4) AS cos_sim
           |FROM graft_ann_search('$wh/$ix', '$wh/$t', 'vec_id',
           |  'embedding', $vec, 10, 'hnsw')
           |ORDER BY kind, cos_sim DESC, vec_id""".stripMargin)
    }),

    // q146: TIME-TRAVEL ANN SERVING THROUGH THE SQL DOOR — "re-run
    // last week's retrieval EXACTLY" for every kind, in SQL: a
    // TIMESTAMP tail argument on graft_ann_search resolves ALL the
    // index artifacts AND the corpus view at that instant (one
    // argument pins the whole serving stack), so the answer set a
    // past session saw reproduces even though the corpus and index
    // have since grown. The fixture commits two generations (base
    // corpus + all three ensures, then growth + refresh) ONCE per
    // JVM; every run serves both eras — AS OF rows can only name
    // generation-1 ids, which the gate output makes visible. SQL ≡
    // library historical serve is pinned in SqlTvfSpec; the
    // generation-exact laws in AnnIndexSpec. Rows-only.
    "q146_sql_ann_asof" -> ((s, d) => {
      val wh = Files.createDirectories(
        Paths.get("target", "pipeline", "graft_wh")).toString
      s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      val (ix, t, tsMid) =
        VtFixtures.memoVal[(String, String, Long)]("sql_ann_asof", d) {
          val ft = "fixasof_" + sqlFixtureSuffix(d)
          val ixr = "ax_" + java.util.UUID.randomUUID().toString
            .replace("-", "").take(10)
          val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
          emb.filter(col("vec_id") % 2 === 0)
            .createOrReplaceTempView("asof_base")
          s.sql(s"DROP TABLE IF EXISTS graft.$ft")
          s.sql(s"CREATE TABLE graft.$ft TBLPROPERTIES ('key' = 'vec_id') " +
            "AS SELECT * FROM asof_base")
          def ensure(kind: String): Unit = s.sql(
            s"""CALL graft.system.ann_ensure(index_root => '$ixr',
               |  table => '$ft', id_col => 'vec_id',
               |  emb_col => 'embedding', kind => '$kind', k => 16,
               |  m => 8)""".stripMargin).collect()
          ensure("ivf"); ensure("pq"); ensure("hnsw")
          val mid = System.currentTimeMillis()
          Thread.sleep(10)
          emb.filter(col("vec_id") % 2 === 1)
            .createOrReplaceTempView("asof_more")
          s.sql(s"INSERT INTO graft.$ft SELECT * FROM asof_more")
          ensure("ivf"); ensure("pq"); ensure("hnsw")
          (ixr, ft, mid)
        }
      val lit = java.time.Instant.ofEpochMilli(tsMid)
        .atZone(java.time.ZoneOffset.UTC).toLocalDateTime.toString
        .replace('T', ' ')
      def serve(kind: String, era: String, asOf: Boolean): String =
        s"""SELECT '$kind' AS kind, '$era' AS era, vec_id,
           |  round(score, 4) AS cos_sim
           |FROM graft_ann_search('$wh/$ix', '$wh/$t', 'vec_id',
           |  'embedding', 0, 5, 4, '$kind'${
             if (asOf) s", TIMESTAMP '$lit'" else ""})""".stripMargin
      s.sql(Seq("ivf", "pq", "hnsw")
        .flatMap(kk => Seq(serve(kk, "asof", asOf = true),
          serve(kk, "current", asOf = false)))
        .mkString("", "\nUNION ALL\n",
          "\nORDER BY kind, era, cos_sim DESC, vec_id"))
    }),

    // q147: FILTERED ANN SEARCH THROUGH THE SQL DOOR — the second query
    // every RAG user writes ("top-k WHERE lang = 'en'"; the reference's
    // per-chunk metadata dict exists exactly for this,
    // /root/reference/src/jobs/embedder.py:73-83): a string tail
    // naming no kind is a FILTER predicate over the corpus columns,
    // composed as s13's PREFILTERED search on the routing tiers —
    // membership exact (only matching rows can appear), ranking
    // routing-approximate, a selective filter under-fills k at fixed
    // width (widen nProbe). The gate serves the ivf (width 16 = every
    // list ⇒ exact over the matching rows) and pq doors plus a
    // filtered BATCH, all riding the committed/file-pruned plans.
    // Filtered-committed ≡ filtered-exact at full width and the hnsw
    // refusal are pinned in SqlTvfSpec; s13's recall/anti-pattern laws
    // in FilteredAnnSpec. Approximate tier → rows-only.
    "q147_sql_ann_filtered" -> ((s, d) => {
      val wh = Files.createDirectories(
        Paths.get("target", "pipeline", "graft_wh")).toString
      s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      // labeled corpus fixture (the filter needs a metadata column);
      // index root memoized like q144 — run 1 trains, later runs are
      // the zero-rebuild serve steady state
      val t = VtFixtures.memoVal[String]("sql_ann_fcorpus", d) {
        val ft = "fixannf_" + sqlFixtureSuffix(d)
        Tables.embeddings(s, d).select("vec_id", "embedding", "label")
          .createOrReplaceTempView("annf_src")
        s.sql(s"DROP TABLE IF EXISTS graft.$ft")
        s.sql(s"CREATE TABLE graft.$ft TBLPROPERTIES ('key' = 'vec_id') " +
          "AS SELECT * FROM annf_src")
        ft
      }
      val ix = VtFixtures.memoVal[String]("sql_ann_filtered_ix", d) {
        "flx_" + java.util.UUID.randomUUID().toString.replace("-", "").take(10)
      }
      def ensure(kind: String) = s.sql(
        s"""CALL graft.system.ann_ensure(index_root => '$ix',
           |  table => '$t', id_col => 'vec_id', emb_col => 'embedding',
           |  kind => '$kind', k => 16, m => 8,
           |  refresh_serving => true)""".stripMargin).collect()
      ensure("ivf"); ensure("pq")
      val pred = "label IN (2, 3) AND vec_id % 5 != 0"
      // each leg also gates the r15 fill column — the per-probe row
      // count a filtered serve reports so an under-filled k is
      // attributable (corpus has < k matches vs routing dropped them)
      s.sql(
        s"""SELECT 'ivf_full' AS door, -1L AS probe_id, vec_id,
           |  round(score, 4) AS cos_sim, fill
           |FROM graft_ann_search('$wh/$ix', '$wh/$t', 'vec_id',
           |  'embedding', 0, 5, 16, 'ivf', '$pred')
           |UNION ALL
           |SELECT 'pq' AS door, -1L AS probe_id, vec_id,
           |  round(score, 4) AS cos_sim, fill
           |FROM graft_ann_search('$wh/$ix', '$wh/$t', 'vec_id',
           |  'embedding', 0, 5, 4, 'pq', '$pred')
           |UNION ALL
           |SELECT 'ivf_batch' AS door, probe_id, vec_id,
           |  round(score, 4) AS cos_sim, fill
           |FROM graft_ann_search('$wh/$ix', '$wh/$t', 'vec_id',
           |  'embedding', array(0, 1), 5, 4, 'ivf', '$pred')
           |ORDER BY door, probe_id, cos_sim DESC, vec_id""".stripMargin)
    }),

    // q143: ANALYTIC SQL THROUGH THE CATALOG DOOR — the plain BI query
    // every SQL user runs first: a parquet fact (lineitem view) joined
    // to a graft catalog dimension under a selective dim filter. With
    // the scan inline ([[graft.plans.GraftScanInline]]) the door plans
    // exactly like the library path: the dim scan reads ONLY
    // (p_partkey, p_brand, p_type, p_size) with the p_size predicate
    // pushed to parquet, and the manifest statistics make the dim
    // STATICALLY broadcast-eligible (the V1Scan fallback bridge
    // reported no statistics, so this join could never
    // static-broadcast before). GraftScanInlineSpec pins the plan
    // shape; this gate pins the answers. Money sums ride the
    // round-to-cents integer convention (q127's oracle precedent).
    "q143_sql_door_join" -> ((s, d) => {
      val wh = Files.createDirectories(
        Paths.get("target", "pipeline", "graft_wh")).toString
      s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      // the CTAS'd dim is the FIXTURE (built once, consumed read-only);
      // measured: the door join itself.
      val pt = VtFixtures.memoVal[String]("sql_door_part", d) {
        val ft = "fixdoor_" + sqlFixtureSuffix(d)
        Tables.part(s, d).createOrReplaceTempView("door_part_src")
        // clear this JVM's own half-built leftover so a retry starts
        // clean (the other SQL fixture builders' precedent)
        s.sql(s"DROP TABLE IF EXISTS graft.$ft")
        s.sql(s"CREATE TABLE graft.$ft TBLPROPERTIES ('key' = 'p_partkey') " +
          "AS SELECT p_partkey, p_brand, p_type, p_size FROM door_part_src")
        ft
      }
      Tables.lineitem(s, d).createOrReplaceTempView("door_lineitem")
      s.sql(
        s"""SELECT p.p_brand, p.p_type, count(*) AS cnt,
           |  CAST(sum(l.l_quantity) AS BIGINT) AS qty_sum,
           |  CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT))
           |    AS BIGINT) AS cents_sum
           |FROM door_lineitem l JOIN graft.$pt p
           |  ON l.l_partkey = p.p_partkey
           |WHERE p.p_size <= 15
           |GROUP BY p.p_brand, p.p_type
           |ORDER BY p_brand, p_type""".stripMargin)
    }),

    // q140: SQL REPO TRANSACTIONS — q113's cross-table atomicity made
    // visible to a SQL-only user: the per-table commits land, then ONE
    // `CALL graft.system.repo_commit(repo, 'facts,agg')` flips the
    // pointer manifest; `repo_snapshot` resolves any historical
    // pointer to its {table -> version} map as rows. The gate unions
    // both repo versions' pin maps with the aggregate total read AT
    // THE PIN, so a torn publish (one table's version visible without
    // the other's) would split the columns. Stale-base refusal is
    // spec-pinned in RepoSpec.
    "q140_sql_repo_commit" -> ((s, d) => {
      val wh = Files.createDirectories(
        Paths.get("target", "pipeline", "graft_wh")).toString
      s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      // the two SQL-published repo transactions are the FIXTURE (built
      // once, consumed READ-ONLY — RepoSpec pins the CAS semantics);
      // measured: the two pinned-pointer snapshot reads.
      val repo = VtFixtures.memo("sql_repo", d) { dir =>
        val base = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderstatus"),
            round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
        def summarize(df: DataFrame) = df.groupBy("o_orderstatus")
          .agg(count(lit(1)).as("cnt"),
            sum("cents").cast("long").as("cents_sum"))
        Versioned.commit(s, Repo.tableRoot(dir, "facts"), base,
          Some("o_orderkey"), files = 4)
        Versioned.commit(s, Repo.tableRoot(dir, "agg"), summarize(base),
          None, files = 1)
        s.sql(s"CALL graft.system.repo_commit(repo => '$dir', " +
          "tables => 'facts,agg')")
        // txn 2: a price restatement lands in BOTH tables, one pointer
        val boosted = base.withColumn("cents",
          when(col("o_orderkey") % 3 === 0, col("cents") * 2)
            .otherwise(col("cents")))
        Versioned.commit(s, Repo.tableRoot(dir, "facts"), boosted,
          Some("o_orderkey"), files = 4, expected = Some(1L))
        Versioned.commit(s, Repo.tableRoot(dir, "agg"), summarize(boosted),
          None, files = 1, expected = Some(1L))
        s.sql(s"CALL graft.system.repo_commit(repo => '$dir', " +
          "tables => 'facts,agg', expected => 1)")
      }
      def stateAt(rv: Long): DataFrame = {
        val pins = s.sql(s"CALL graft.system.repo_snapshot(" +
          s"repo => '$repo', version => $rv)")
          .groupBy(col("repo_version").as("repo_v"))
          .agg(
            max(when(col("table") === "facts", col("version")))
              .cast("long").as("facts_v"),
            max(when(col("table") === "agg", col("version")))
              .cast("long").as("agg_v"))
        pins.crossJoin(Repo.read(s, repo, "agg", rv)
          .agg(sum("cents_sum").cast("long").as("total_e2")))
      }
      stateAt(1L).unionByName(stateAt(2L)).orderBy("repo_v")
    }),

    // q141: STANDARD-SQL DDL LIFECYCLE — column DEFAULT, GENERATED
    // ALWAYS AS (expr) and CONSTRAINT ... CHECK declared in the CREATE
    // column list itself (the TableCatalogCapability surface, not
    // TBLPROPERTIES), then exercised: a column-list insert takes the
    // write default, the generated column is recomputed per write, a
    // violating insert is ATOMICALLY rejected (no version minted —
    // graft_history pins the exact count), and ALTER COLUMN SET
    // DEFAULT redefines the fill write-forward only.
    "q141_sql_ddl_constraints" -> ((s, d) => {
      val wh = Files.createDirectories(
        Paths.get("target", "pipeline", "graft_wh")).toString
      s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      val t = "t_" + java.util.UUID.randomUUID().toString
        .replace("-", "").take(10)
      s.sql(
        s"""CREATE TABLE graft.$t (
           |  o_orderkey BIGINT,
           |  cents BIGINT DEFAULT -5,
           |  prio STRING GENERATED ALWAYS AS
           |    (CASE WHEN cents >= 100000 THEN 'big' ELSE 'small' END),
           |  CONSTRAINT cents_floor CHECK (cents >= -5)
           |) TBLPROPERTIES ('key' = 'o_orderkey')""".stripMargin)
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
        .createOrReplaceTempView("ddl_base")
      s.sql(s"INSERT INTO graft.$t (o_orderkey, cents) " +
        "SELECT o_orderkey, cents FROM ddl_base WHERE o_orderkey % 2 = 0")
      // omitted column takes the declared DEFAULT (-5)
      s.sql(s"INSERT INTO graft.$t (o_orderkey) " +
        "SELECT o_orderkey FROM ddl_base WHERE o_orderkey % 2 = 1")
      // atomic reject: the violating batch must mint NOTHING
      val refused =
        try {
          s.sql(s"INSERT INTO graft.$t (o_orderkey, cents) " +
            "VALUES (2000000001, -100)")
          false
        } catch {
          // only the CHECK gate's own violation counts as a refusal
          // (Spark may wrap it, so walk the cause chain); any other
          // failure — catalog misconfig, path error — must FAIL the
          // gate, not masquerade as an atomic reject
          case e: Exception =>
            val isViolation = Iterator.iterate[Throwable](e)(_.getCause)
              .takeWhile(_ != null)
              .exists(_.isInstanceOf[Versioned.ConstraintViolationException])
            if (!isViolation) throw e
            true
        }
      // redefining the default is write-forward only
      s.sql(s"ALTER TABLE graft.$t ALTER COLUMN cents SET DEFAULT 7")
      s.sql(s"INSERT INTO graft.$t (o_orderkey) VALUES (2000000000)")
      s.sql(s"""SELECT prio, count(*) AS cnt,
        CAST(sum(cents) AS BIGINT) AS cents_sum,
        (SELECT count(*) FROM graft_history('$wh/$t')) AS n_versions,
        ${refused} AS refused
        FROM graft.$t GROUP BY prio ORDER BY prio""")
    }),

    // q134: SQL MAINTENANCE PROCEDURES (Spark 4's native
    // ProcedureCatalog hook — Iceberg's CALL catalog.system.* surface,
    // no parser extension): optimize bin-packs the three tiny insert
    // files toward the target, recluster evolves the clustering key
    // (only violating files rewrite — all of them here, the key
    // changed). Each CALL is one library commit under the same CAS as
    // every writer; the gate pins rows/sum unchanged through both
    // maintenance commits and the exact version count (create + 3
    // inserts + optimize + recluster = 6) via graft_history.
    "q134_sql_call" -> ((s, d) => {
      val wh = Files.createDirectories(
        Paths.get("target", "pipeline", "graft_wh")).toString
      s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      // the 3-insert trickle table is the FIXTURE (file-copied per
      // run); measured: the two maintenance CALLs + the read.
      val t = "t_" + java.util.UUID.randomUUID().toString
        .replace("-", "").take(10)
      val callFix = VtFixtures.memoVal[String]("sql_call_fix", d) {
        val ft = "fixcall_" + sqlFixtureSuffix(d)
        // a leftover under this (jvm, sf dir)-scoped name can only be
        // this JVM's own half-built fixture (the build threw after
        // CREATE); drop it so the retry starts clean
        s.sql(s"DROP TABLE IF EXISTS graft.$ft")
        s.sql(s"CREATE TABLE graft.$ft (o_orderkey BIGINT, cents BIGINT) " +
          "TBLPROPERTIES ('key' = 'o_orderkey')")
        Tables.orders(s, d)
          .select(col("o_orderkey"),
            round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
          .createOrReplaceTempView("call_src")
        (0 until 3).foreach { i =>
          s.sql(s"INSERT INTO graft.$ft SELECT * FROM call_src " +
            s"WHERE o_orderkey % 3 = $i")
        }
        s"$wh/$ft"
      }
      VtFixtures.copy(callFix, s"$wh/$t")
      // 1 GiB target: the three insert files stay far under the
      // 0.75*target compaction cutoff at every harness scale factor,
      // so the OPTIMIZE version ALWAYS mints and the oracle's version
      // arithmetic holds from sf0.001 through sf1
      s.sql(s"CALL graft.system.optimize(table => '$t', target_mb => 1024)")
      s.sql(s"CALL graft.system.recluster(table => '$t', key => 'cents')")
      s.sql(s"""SELECT count(*) AS cnt, CAST(sum(cents) AS BIGINT)
        AS cents_sum, (SELECT count(*) FROM graft_history('$wh/$t'))
        AS n_versions FROM graft.$t""")
    }),

    // q138: CONVERT TO graft IN PLACE (Delta's CONVERT TO DELTA): a
    // pre-existing plain-parquet directory becomes a versioned table
    // by REFERENCE — one footer pass for stats, one manifest, zero
    // rows rewritten — and the full mutation surface applies
    // immediately: the gate lands a merge-on-read DELETE on top (v2,
    // also zero rewrite: the adopted files stay untouched and a DV
    // masks the tombstoned keys), then reads the final state. The
    // oracle recomputes survivors from orders; n_versions pins the
    // convert + delete arithmetic.
    "q138_convert_in_place" -> ((s, d) => {
      // the pre-existing plain-parquet dir is the FIXTURE (file-copied
      // per run — convert adopts it in place); measured: the convert,
      // the MoR delete, and the read.
      val dir = VtFixtures.freshCopy("convert_src", d) { fix =>
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderstatus"),
            round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
          .repartitionByRange(4, col("o_orderkey"))
          .sortWithinPartitions("o_orderkey")
          .write.mode("overwrite").parquet(fix)
      }
      Versioned.convertInPlace(s, dir, Some("o_orderkey"))
      Versioned.deleteMergeOnRead(s, dir,
        Tables.orders(s, d).select(col("o_orderkey"))
          .filter(col("o_orderkey") % 11 === 0),
        "o_orderkey")
      Versioned.read(s, dir)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          sum("cents").cast("long").as("cents_sum"))
        .withColumn("n_versions",
          lit(Versioned.latestVersion(s, dir)))
        .orderBy("o_orderstatus")
    }),

    // q135: DECLARATIVE DDL properties + METADATA TABLES through pure
    // SQL naming. CREATE TABLE's TBLPROPERTIES land the CHECK
    // constraint and the GENERATED ALWAYS AS IDENTITY column as their
    // own versioned DDL commits (create + check + identity = 3
    // versions before any data); the identity allocator assigns dense
    // key-ordered ids across BOTH inserts off the manifest high-water
    // mark (the second insert omits rid via a column list — Spark
    // null-fills it, the all-null column reads as an omission); and
    // `<table>.history` / `<table>.files` resolve as metadata
    // relations (Iceberg metadata-table naming) with zero data I/O.
    // The oracle pins the id algebra (sum 1..N) and the exact commit
    // arithmetic.
    "q135_sql_meta" -> ((s, d) => {
      val wh = Files.createDirectories(
        Paths.get("target", "pipeline", "graft_wh")).toString
      s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      // the DDL-properties + identity-stamped insert history is the
      // FIXTURE (built once, consumed READ-ONLY; IdentitySpec pins the
      // allocator itself); measured: the metadata-relation reads.
      val t = VtFixtures.memoVal[String]("sql_meta_fix", d) {
        val ft = "fixmeta_" + sqlFixtureSuffix(d)
        // a leftover under this (jvm, sf dir)-scoped name can only be
        // this JVM's own half-built fixture (the build threw after
        // CREATE); drop it so the retry starts clean
        s.sql(s"DROP TABLE IF EXISTS graft.$ft")
        s.sql(s"CREATE TABLE graft.$ft (o_orderkey BIGINT, cents BIGINT) " +
          "TBLPROPERTIES ('key' = 'o_orderkey', " +
          "'check.cents_nonneg' = 'cents >= 0', 'identity' = 'rid')")
        Tables.orders(s, d)
          .select(col("o_orderkey"),
            round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
          .createOrReplaceTempView("meta_src")
        s.sql(s"INSERT INTO graft.$ft SELECT * FROM meta_src " +
          "WHERE o_orderkey % 2 = 0")
        s.sql(s"INSERT INTO graft.$ft (o_orderkey, cents) " +
          "SELECT * FROM meta_src WHERE o_orderkey % 2 = 1")
        ft
      }
      s.sql(s"""SELECT count(*) AS cnt, CAST(sum(rid) AS BIGINT) AS rid_sum,
        (SELECT count(*) FROM graft.$t.history) AS n_versions,
        (SELECT CAST(sum(rows) AS BIGINT) FROM graft.$t.files) AS file_rows
        FROM graft.$t""")
    })
  )

  /** The RAG pipelines' SHARED DuckDB oracle algebra (p03 and p07 must
    * never drift): document assembly → 64-char chunking → md5-prefix
    * token hash → 64-dim signed components → squared-L2 top-3 with
    * chunk_id ties. `silverCte` supplies the corpus variant (p03:
    * original titles; p07: 2nd-edition revisions applied); `finalSelect`
    * the projection over the shared CTEs (`chunks` carries `id`,
    * `top` carries rk/book_url/chunk) — it may open with further CTEs
    * (", name AS (...)") before its SELECT. */
  private def ragOracleSql(silverCte: String, finalSelect: String): String =
    s"""WITH silver AS (
       |$silverCte),
       |docs AS (
       |  SELECT id, book_url,
       |    'Title: ' || title || '. Category: ' || category ||
       |      '. Description: ' || coalesce(descr, '') AS doc
       |  FROM silver),
       |chunks AS (
       |  SELECT id, 'book_' || id || '_chunk_' || CAST(i AS VARCHAR) AS chunk_id,
       |    book_url, substr(doc, CAST(i AS INT) * 64 + 1, 64) AS chunk
       |  FROM docs, unnest(range(CAST(ceil(length(doc) / 64.0) AS BIGINT))) AS u(i)),
       |ct AS (
       |  SELECT chunk_id,
       |    unnest(list_filter(string_split_regex(lower(chunk), '\\W+'), x -> x <> ''))
       |      AS tok
       |  FROM chunks),
       |ccomp AS (
       |  SELECT chunk_id, h % 64 AS idx,
       |    CAST(sum(CASE WHEN (h >> 16) % 2 = 0 THEN 1 ELSE -1 END) AS DOUBLE) AS v
       |  FROM (SELECT chunk_id, CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS h
       |        FROM ct)
       |  GROUP BY 1, 2),
       |qt AS (
       |  SELECT unnest(list_filter(string_split_regex(
       |    lower('a small polished component'), '\\W+'), x -> x <> '')) AS tok),
       |qcomp AS (
       |  SELECT h % 64 AS idx,
       |    CAST(sum(CASE WHEN (h >> 16) % 2 = 0 THEN 1 ELSE -1 END) AS DOUBLE) AS qv
       |  FROM (SELECT CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS h FROM qt)
       |  GROUP BY 1),
       |scored AS (
       |  SELECT ch.chunk_id, ch.book_url, ch.chunk,
       |    coalesce(sum(c.v * c.v), 0) - 2 * coalesce(sum(c.v * q.qv), 0) AS pd2
       |  FROM chunks ch
       |  LEFT JOIN ccomp c ON ch.chunk_id = c.chunk_id
       |  LEFT JOIN qcomp q ON c.idx = q.idx
       |  GROUP BY 1, 2, 3),
       |top AS (
       |  SELECT chunk_id, book_url, chunk,
       |    row_number() OVER (ORDER BY pd2, chunk_id) AS rk
       |  FROM scored ORDER BY pd2, chunk_id LIMIT 3)
       |$finalSelect""".stripMargin

  val oracles: Map[String, String] = Map(
    "p01_pipeline_silver" ->
      """SELECT p_brand AS category, count(*) AS n_books,
        |  round(sum(p_retailprice), 2) AS total_price,
        |  CAST(sum(CASE WHEN p_size % 7 = 0 THEN 0 ELSE p_size END) AS BIGINT) AS total_qty,
        |  count(CASE WHEN p_size % 7 <> 0 THEN 1 END) AS in_stock,
        |  count(CASE WHEN p_partkey % 5 <> 0 THEN 1 END) AS with_desc
        |FROM part GROUP BY p_brand ORDER BY category""".stripMargin,
    // Rebuilds the entire RAG DAG from `part`: silver fields → document
    // assembly → 64-char chunks → md5-prefix hash embedding per chunk →
    // squared-L2 top-3 against the question embedding (|c|²−2c·q ranks
    // identically to L2: the +|q|² term is constant) → top-1 source +
    // prompt length = 70 (template minus %s) + Σ top-3 chunk lengths +
    // 2×7 (separators) + question length. All arithmetic on
    // integer-valued doubles — exact across engines.
    "p03_rag_pipeline" -> ragOracleSql(
      """  SELECT CAST(p_partkey AS VARCHAR) AS id, p_name AS title,
        |    p_brand AS category,
        |    CASE WHEN p_partkey % 5 = 0 THEN NULL
        |         ELSE 'A ' || p_type || ' component.' END AS descr,
        |    'https://example.test/part/' || CAST(p_partkey AS VARCHAR) AS book_url
        |  FROM part""".stripMargin,
      """SELECT 'a small polished component' AS question,
        |  false AS fallback_used,
        |  (SELECT book_url FROM top WHERE rk = 1) AS source,
        |  (SELECT count(*) FROM part) AS books,
        |  (SELECT count(*) FROM chunks) AS chunks,
        |  CAST(70 + (SELECT sum(length(chunk)) FROM top) + 14 + 26 AS BIGINT)
        |    AS prompt_len""".stripMargin),
    // p03's embedding algebra over the FINAL corpus (2nd-edition
    // titles applied); both sides must produce the identical row, and
    // `reembedded` = chunks of exactly the changed docs (new %2=1 +
    // revised %10=0).
    "p07_incremental_rag" -> ragOracleSql(
      """  SELECT CAST(p_partkey AS VARCHAR) AS id,
        |    CASE WHEN p_partkey % 10 = 0 THEN p_name || ' (2nd ed.)'
        |         ELSE p_name END AS title,
        |    p_brand AS category,
        |    CASE WHEN p_partkey % 5 = 0 THEN NULL
        |         ELSE 'A ' || p_type || ' component.' END AS descr,
        |    'https://example.test/part/' || CAST(p_partkey AS VARCHAR) AS book_url
        |  FROM part""".stripMargin,
      """, sides AS (SELECT 'incremental' AS side UNION ALL SELECT 'rebuild')
        |SELECT side, 'a small polished component' AS question,
        |  false AS fallback_used,
        |  (SELECT book_url FROM top WHERE rk = 1) AS source,
        |  (SELECT count(*) FROM part) AS books,
        |  (SELECT count(*) FROM chunks) AS chunks,
        |  (SELECT count(*) FROM chunks
        |   WHERE CAST(id AS BIGINT) % 2 = 1 OR CAST(id AS BIGINT) % 10 = 0)
        |    AS reembedded,
        |  CAST(70 + (SELECT sum(length(chunk)) FROM top) + 14 + 26 AS BIGINT)
        |    AS prompt_len
        |FROM sides ORDER BY side""".stripMargin),
    "q75_append_ingest" ->
      """SELECT o_orderstatus, count(*) AS cnt,
        |  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_keys,
        |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS total_e2
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // The applied state: updates (%7 minus deletes) uplifted, inserts
    // added under fresh keys, deletes (%11) gone, everything else
    // untouched.
    "q79_apply_changes" ->
      """WITH t AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |res AS (
        |  SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice * 1.1 AS o_totalprice
        |  FROM t WHERE o_orderkey % 7 = 0 AND o_orderkey % 11 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, 'N', o_totalprice / 2
        |  FROM t WHERE o_orderkey % 13 = 0
        |  UNION ALL
        |  SELECT * FROM t WHERE o_orderkey % 7 <> 0 AND o_orderkey % 11 <> 0)
        |SELECT o_orderstatus, count(*) AS cnt,
        |  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_keys,
        |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS total_e2
        |FROM res GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q99_generated_columns" ->
      """WITH t AS (SELECT o_orderkey, o_totalprice FROM orders),
        |app AS (
        |  SELECT o_orderkey + 10000000 AS o_orderkey,
        |         o_totalprice / 2 AS o_totalprice,
        |         CASE WHEN o_totalprice / 2 >= 200000 THEN 'H'
        |              WHEN o_totalprice / 2 >= 100000 THEN 'M'
        |              ELSE 'L' END AS price_band
        |  FROM t WHERE o_orderkey % 13 = 0),
        |res AS (
        |  SELECT o_orderkey, o_totalprice, NULL AS price_band FROM t
        |  UNION ALL SELECT * FROM app)
        |SELECT coalesce(price_band, 'none') AS price_band, count(*) AS cnt,
        |  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_keys,
        |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS total_e2
        |FROM res GROUP BY 1 ORDER BY price_band""".stripMargin,
    "q98_merge_schema_evolution" ->
      """WITH t AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |res AS (
        |  SELECT o_orderkey, o_totalprice * 1.1 AS o_totalprice,
        |         'HI' AS o_priority
        |  FROM t WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_totalprice / 2, 'NEW'
        |  FROM t WHERE o_orderkey % 13 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice, NULL
        |  FROM t WHERE o_orderkey % 7 <> 0)
        |SELECT coalesce(o_priority, 'none') AS prio, count(*) AS cnt,
        |  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_keys,
        |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS total_e2
        |FROM res GROUP BY 1 ORDER BY prio""".stripMargin,
    // Both versions hold the same rows; each side is the range filter
    // on its own clustering key.
    "q88_recluster" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        |  FROM orders),
        |a AS (
        |  SELECT 'v1_orderkey' AS side, count(*) AS cnt,
        |    CAST(sum(cents) AS BIGINT) AS cents_sum,
        |    CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust
        |  FROM base WHERE o_orderkey BETWEEN 1000 AND 3000),
        |b AS (
        |  SELECT 'v2_custkey' AS side, count(*) AS cnt,
        |    CAST(sum(cents) AS BIGINT) AS cents_sum,
        |    CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust
        |  FROM base WHERE o_custkey BETWEEN 100 AND 300)
        |SELECT * FROM a UNION ALL SELECT * FROM b ORDER BY side""".stripMargin,
    // Branch fork/merge: pristine = orders cents; dev = %7 keys
    // uplifted by integer tenth. main_before and tag_r1 pin the
    // pristine state; dev_head and main_after (post-merge) the uplift.
    "q111_branch_merge" ->
      """WITH base AS (
        |  SELECT o_orderkey,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        |  FROM orders),
        |up AS (
        |  SELECT CASE WHEN o_orderkey % 7 = 0
        |    THEN cents + cents // 10 ELSE cents END AS cents FROM base),
        |pristine AS (SELECT count(*) AS cnt, CAST(sum(cents) AS BIGINT) AS cents_sum FROM base),
        |lifted AS (SELECT count(*) AS cnt, CAST(sum(cents) AS BIGINT) AS cents_sum FROM up)
        |SELECT 'dev_head' AS side, cnt, cents_sum FROM lifted
        |UNION ALL SELECT 'main_after', cnt, cents_sum FROM lifted
        |UNION ALL SELECT 'main_before', cnt, cents_sum FROM pristine
        |UNION ALL SELECT 'tag_r1', cnt, cents_sum FROM pristine
        |ORDER BY side""".stripMargin,
    // Repo txn: the aggregate table must equal the recompute from the
    // pinned facts at BOTH repo versions — the oracle derives each
    // state once and emits it through both column pairs.
    "q113_repo_txn" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        |  FROM orders),
        |v1 AS (
        |  SELECT o_orderstatus, count(*) AS cnt,
        |    CAST(sum(cents) AS BIGINT) AS cs
        |  FROM base GROUP BY 1),
        |v2 AS (
        |  SELECT o_orderstatus, count(*) AS cnt,
        |    CAST(sum(cents) AS BIGINT) AS cs
        |  FROM base WHERE o_orderkey % 11 <> 0 GROUP BY 1)
        |SELECT CAST(1 AS BIGINT) AS repo_v, o_orderstatus, cnt AS cnt_facts,
        |  cnt AS cnt_agg, cs AS cents_facts, cs AS cents_agg FROM v1
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), o_orderstatus, cnt, cnt, cs, cs FROM v2
        |ORDER BY repo_v, o_orderstatus""".stripMargin,
    // Branch WAP: audit = the dirty rows of the staged batch; reject
    // leaves the base pristine; promote = base + clean rows.
    "q114_branch_wap" ->
      """WITH base AS (
        |  SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        |  FROM orders),
        |batch AS (
        |  SELECT CASE WHEN i % 10 = 0 THEN CAST(-100 AS BIGINT)
        |         ELSE CAST(i * 10 AS BIGINT) END AS cents
        |  FROM range(1, 51) t(i)),
        |dirty AS (SELECT count(*) AS cnt,
        |  CAST(coalesce(sum(cents), 0) AS BIGINT) AS cs
        |  FROM batch WHERE cents < 0),
        |pristine AS (SELECT count(*) AS cnt, CAST(sum(cents) AS BIGINT) AS cs
        |  FROM base),
        |promoted AS (SELECT count(*) AS cnt, CAST(sum(cents) AS BIGINT) AS cs
        |  FROM (SELECT cents FROM base
        |        UNION ALL SELECT cents FROM batch WHERE cents >= 0))
        |SELECT 'audit_dirty' AS step, cnt, cs AS cents_sum FROM dirty
        |UNION ALL SELECT 'state_after_reject', cnt, cs FROM pristine
        |UNION ALL SELECT 'state_after_promote', cnt, cs FROM promoted
        |ORDER BY step""".stripMargin,
    // The final A₃⋈B₂ population under both side tags: delta-join
    // maintenance must be indistinguishable from recompute.
    "q115_incremental_join_view" ->
      """WITH a1 AS (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        |  FROM orders),
        |a2 AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 9 = 0 THEN (o_custkey % 500) + 1
        |         ELSE o_custkey END AS o_custkey,
        |    CASE WHEN o_orderkey % 9 = 0 THEN cents + 5000
        |         ELSE cents END AS cents
        |  FROM a1
        |  UNION ALL
        |  SELECT o_orderkey + 20000000, o_custkey, cents // 4
        |  FROM a1 WHERE o_orderkey % 21 = 0),
        |a3 AS (
        |  SELECT * FROM a2 WHERE o_orderkey NOT IN
        |    (SELECT o_orderkey FROM a1 WHERE o_orderkey % 15 = 0)),
        |b2 AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 10 = 0 THEN 'PROMO'
        |         ELSE c_mktsegment END AS segment
        |  FROM customer),
        |agg AS (
        |  SELECT segment, count(*) AS cnt,
        |    CAST(sum(cents) AS BIGINT) AS cents_sum
        |  FROM a3 JOIN b2 ON a3.o_custkey = b2.c_custkey GROUP BY 1)
        |SELECT side, segment, cnt, cents_sum
        |FROM agg CROSS JOIN (SELECT unnest(['incremental', 'recompute']) AS side)
        |ORDER BY side, segment""".stripMargin,
    // Branch carries ONLY the cherry-picked fix; the parent carries
    // fix + delete — the intended divergence.
    "q117_cherry_pick" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        |  FROM orders),
        |fixed AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 7 = 0 THEN 'U' ELSE o_orderstatus END
        |      AS o_orderstatus,
        |    CASE WHEN o_orderkey % 7 = 0 THEN cents + 111 ELSE cents END
        |      AS cents
        |  FROM base),
        |br AS (SELECT o_orderstatus, count(*) AS cnt,
        |  CAST(sum(cents) AS BIGINT) AS cs FROM fixed GROUP BY 1),
        |pa AS (SELECT o_orderstatus, count(*) AS cnt,
        |  CAST(sum(cents) AS BIGINT) AS cs
        |  FROM fixed WHERE o_orderkey % 11 <> 0 GROUP BY 1)
        |SELECT 'branch' AS side, o_orderstatus, cnt, cs AS cents_sum FROM br
        |UNION ALL SELECT 'parent', o_orderstatus, cnt, cs FROM pa
        |ORDER BY side, o_orderstatus""".stripMargin,
    // Reverting v2 after v3: every v2 effect gone (updates restored,
    // %7∧%11 keys re-inserted at base values, inserts deleted); v3's
    // delete of untouched keys stays.
    "q118_revert" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        |  FROM orders)
        |SELECT o_orderstatus, count(*) AS cnt,
        |  CAST(sum(cents) AS BIGINT) AS cents_sum
        |FROM base WHERE o_orderkey % 11 <> 0 OR o_orderkey % 7 = 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // Pre-add rows read the default, explicit post-add NULLs survive,
    // the omitting append materializes the write-default.
    "q119_column_defaults" ->
      """WITH base AS (
        |  SELECT o_orderkey,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        |  FROM orders),
        |pre AS (SELECT cents, 'std' AS tier FROM base),
        |ap1 AS (
        |  SELECT cents // 3 AS cents,
        |    CASE WHEN o_orderkey % 2 = 0 THEN 'pro' ELSE NULL END AS tier
        |  FROM base WHERE o_orderkey % 19 = 0),
        |ap2 AS (
        |  SELECT cents // 5 AS cents, 'std' AS tier
        |  FROM base WHERE o_orderkey % 23 = 0),
        |alls AS (
        |  SELECT * FROM pre
        |  UNION ALL SELECT * FROM ap1
        |  UNION ALL SELECT * FROM ap2)
        |SELECT tier, count(*) AS cnt, CAST(sum(cents) AS BIGINT) AS cents_sum
        |FROM alls GROUP BY tier ORDER BY tier NULLS FIRST""".stripMargin,
    // Dense ids: batch 1 ranked by key from 1, batch 2 continues from
    // batch 1's count — the allocator is deterministic end to end.
    "q120_identity_column" ->
      """WITH b1 AS (
        |  SELECT o_orderkey + 30000000 AS k FROM orders
        |  WHERE o_orderkey % 19 = 0),
        |b2 AS (
        |  SELECT o_orderkey + 40000000 AS k FROM orders
        |  WHERE o_orderkey % 23 = 0),
        |n1 AS (SELECT count(*) AS c FROM b1),
        |r1 AS (SELECT row_number() OVER (ORDER BY k) AS row_id, k FROM b1),
        |r2 AS (SELECT n1.c + row_number() OVER (ORDER BY k) AS row_id, k
        |       FROM b2, n1)
        |SELECT row_id, k AS o_orderkey FROM r1
        |UNION ALL SELECT row_id, k FROM r2
        |ORDER BY row_id""".stripMargin,
    // Population counts from orders; the id invariants (dense [0,N),
    // zero moved ids) are exact contracts the engine must meet.
    "q121_row_tracking" ->
      """SELECT count(*) AS n_rows, count(*) AS n_ids,
        |  CAST(0 AS BIGINT) AS min_id,
        |  CAST(count(*) - 1 AS BIGINT) AS max_id,
        |  (SELECT count(*) FROM orders WHERE o_orderkey % 3 IN (0, 1))
        |    AS carried_rows,
        |  CAST(0 AS BIGINT) AS moved_ids
        |FROM orders""".stripMargin,
    // mor = the DV-masked logical view; plain = the FULL v1 snapshot
    // (the post-export delete must be invisible to the symlink export)
    "q122_snapshot_export" ->
      """WITH t AS (
        |  SELECT o_orderkey,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        |  FROM orders)
        |SELECT 'mor' AS side, count(*) AS cnt,
        |  CAST(sum(cents) AS BIGINT) AS cents_sum, 1 AS materialized
        |FROM t WHERE o_orderkey % 5 <> 0
        |UNION ALL
        |SELECT 'plain', count(*), CAST(sum(cents) AS BIGINT), 0 FROM t
        |ORDER BY side""".stripMargin,
    "q128_metadata_count" ->
      """SELECT count(*) AS n, min(o_orderkey) AS min_key,
        |  max(o_orderkey) AS max_key,
        |  (SELECT count(*) FROM orders WHERE o_orderkey % 2 = 0)
        |    AS n_filtered
        |FROM orders""".stripMargin,
    "q129_sql_catalog" ->
      """SELECT count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS cents_sum,
        |  (SELECT count(*) FROM orders WHERE o_orderkey % 2 = 0) AS v2_rows
        |FROM orders""".stripMargin,
    // Survivors = NOT(predicate): FALSE and NULL rows stay (none here —
    // orders columns are non-null), modulo and the status equality both
    // inside the one pushed conjunction.
    "q130_sql_delete" ->
      """SELECT o_orderstatus, count(*) AS cnt,
        |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS cents_sum,
        |  (SELECT count(*) FROM orders) AS pre_delete_rows
        |FROM orders
        |WHERE NOT (o_orderkey % 13 = 0
        |  OR (o_orderkey <= 1500 AND o_orderstatus = 'F'))
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // Survivors = orders minus the %11 tombstones; convert + MoR
    // delete = 2 versions.
    "q138_convert_in_place" ->
      """SELECT o_orderstatus, count(*) AS cnt,
        |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS cents_sum,
        |  2 AS n_versions
        |FROM orders WHERE o_orderkey % 11 <> 0
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // Identity ids are dense 1..N whatever the insert split; versions
    // = create + check DDL + identity DDL + 2 inserts.
    "q135_sql_meta" ->
      """WITH n AS (SELECT count(*) AS cnt FROM orders)
        |SELECT cnt, CAST(cnt * (cnt + 1) / 2 AS BIGINT) AS rid_sum,
        |  5 AS n_versions, cnt AS file_rows
        |FROM n""".stripMargin,
    // Maintenance commits move bytes, never rows: the data aggregate
    // is orders verbatim; n_versions is the exact commit arithmetic.
    "q134_sql_call" ->
      """SELECT count(*) AS cnt,
        |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS cents_sum,
        |  6 AS n_versions
        |FROM orders""".stripMargin,
    // Post-update state as a CASE projection over orders.
    "q132_sql_update" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        |  FROM orders),
        |upd AS (
        |  SELECT
        |    CASE WHEN o_orderkey % 5 = 0 AND cents > 1000000
        |      THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
        |    CASE WHEN o_orderkey % 5 = 0 AND cents > 1000000
        |      THEN cents * 2 ELSE cents END AS cents
        |  FROM base)
        |SELECT o_orderstatus, count(*) AS cnt,
        |  CAST(sum(cents) AS BIGINT) AS cents_sum
        |FROM upd GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // The merge cascade recomputed: matched-even rows updated,
    // matched-odd rows deleted, shifted %13 keys inserted.
    "q133_sql_merge" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        |  FROM orders),
        |merged AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 7 = 0 AND cents % 2 = 0
        |      THEN 'M' ELSE o_orderstatus END AS st,
        |    CASE WHEN o_orderkey % 7 = 0 AND cents % 2 = 0
        |      THEN cents * 3 ELSE cents END AS cents
        |  FROM base
        |  WHERE NOT (o_orderkey % 7 = 0 AND cents % 2 = 1)
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, 'N', cents FROM base
        |  WHERE o_orderkey % 13 = 0)
        |SELECT st AS o_orderstatus, count(*) AS cnt,
        |  CAST(sum(cents) AS BIGINT) AS cents_sum
        |FROM merged GROUP BY st ORDER BY st""".stripMargin,
    // The evolving merge recomputed: %7 keys updated (tripled cents,
    // 'HI'), shifted %13 keys inserted ('NEW'), everything else
    // untouched (null priority -> 'none').
    "q139_sql_merge_schema_evolution" ->
      """WITH base AS (
        |  SELECT o_orderkey,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        |  FROM orders),
        |final AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 7 = 0 THEN cents * 300000 ELSE cents END
        |      AS cents,
        |    CASE WHEN o_orderkey % 7 = 0 THEN 'HI' ELSE 'none' END AS prio
        |  FROM base
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, cents, 'NEW' FROM base
        |  WHERE o_orderkey % 13 = 0)
        |SELECT prio, count(*) AS cnt, count(DISTINCT o_orderkey) AS n_keys,
        |  CAST(sum(cents) AS BIGINT) AS cents_sum
        |FROM final GROUP BY prio ORDER BY prio""".stripMargin,
    // The door join recomputed directly over the parquet: same dim
    // filter, same round-to-cents integer convention.
    "q143_sql_door_join" ->
      """SELECT p.p_brand, p.p_type, count(*) AS cnt,
        |  CAST(sum(l.l_quantity) AS BIGINT) AS qty_sum,
        |  CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT))
        |    AS BIGINT) AS cents_sum
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE p.p_size <= 15
        |GROUP BY p.p_brand, p.p_type
        |ORDER BY p_brand, p_type""".stripMargin,
    // CREATE(1) + generated(2) + default(3) + check(4) + 2 inserts
    // (5,6) + rejected insert (nothing) + SET DEFAULT(7) + insert(8);
    // evens keep real cents, odds take default -5, the late row takes
    // the redefined default 7.
    "q141_sql_ddl_constraints" ->
      """WITH base AS (
        |  SELECT o_orderkey,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        |  FROM orders),
        |final AS (
        |  SELECT cents FROM base WHERE o_orderkey % 2 = 0
        |  UNION ALL
        |  SELECT CAST(-5 AS BIGINT) FROM base WHERE o_orderkey % 2 = 1
        |  UNION ALL
        |  SELECT CAST(7 AS BIGINT))
        |SELECT CASE WHEN cents >= 100000 THEN 'big' ELSE 'small' END AS prio,
        |  count(*) AS cnt, CAST(sum(cents) AS BIGINT) AS cents_sum,
        |  CAST(8 AS BIGINT) AS n_versions, true AS refused
        |FROM final GROUP BY 1 ORDER BY prio""".stripMargin,
    // Each repo transaction pins both member tables at the same
    // version; the pointer maps and the pinned aggregate totals are
    // pure arithmetic over orders.
    "q140_sql_repo_commit" ->
      """WITH base AS (
        |  SELECT o_orderkey,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        |  FROM orders)
        |SELECT CAST(1 AS BIGINT) AS repo_v, CAST(1 AS BIGINT) AS facts_v,
        |  CAST(1 AS BIGINT) AS agg_v,
        |  (SELECT CAST(sum(cents) AS BIGINT) FROM base) AS total_e2
        |UNION ALL
        |SELECT 2, 2, 2,
        |  (SELECT CAST(sum(CASE WHEN o_orderkey % 3 = 0
        |     THEN cents * 2 ELSE cents END) AS BIGINT) FROM base)
        |ORDER BY repo_v""".stripMargin,
    // Final state: even keys from phase 1 (cents absent -> NULL ->
    // coalesce -5), odd keys from phase 2 with real cents; prio reads
    // wide for both phases after the widen.
    "q131_sql_alter" ->
      """WITH base AS (
        |  SELECT o_orderkey,
        |    CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS prio,
        |    CASE WHEN o_orderkey % 2 = 1
        |      THEN CAST(round(o_totalprice * 100, 0) AS BIGINT) END AS cents
        |  FROM orders)
        |SELECT prio, count(*) AS cnt,
        |  CAST(sum(coalesce(cents, -5)) AS BIGINT) AS cents_sum,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum
        |FROM base GROUP BY prio ORDER BY prio""".stripMargin,
    // q74's event algebra + the version-1 creation block (Delta's
    // inclusive startingVersion).
    "q127_cdf_format_door" ->
      """WITH t AS (SELECT o_orderkey, o_totalprice FROM orders),
        |upd AS (SELECT o_orderkey, o_totalprice * 1.1 AS newp, o_totalprice AS oldp
        |  FROM t WHERE o_orderkey % 7 = 0),
        |ins AS (SELECT o_orderkey + 10000000 AS o_orderkey, o_totalprice / 2 AS newp
        |  FROM t WHERE o_orderkey % 13 = 0),
        |v2 AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 1.1
        |         ELSE o_totalprice END AS price
        |  FROM t
        |  UNION ALL SELECT o_orderkey, newp FROM ins),
        |allr AS (
        |  SELECT 1 AS version, 'insert' AS change_type,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS d FROM t
        |  UNION ALL
        |  SELECT 2, 'insert', CAST(round(newp * 100, 0) AS BIGINT) FROM ins
        |  UNION ALL
        |  SELECT 2, 'update', CAST(round((newp - oldp) * 100, 0) AS BIGINT) FROM upd
        |  UNION ALL
        |  SELECT 3, 'delete', CAST(round((0 - price) * 100, 0) AS BIGINT)
        |  FROM v2
        |  WHERE o_orderkey IN (SELECT o_orderkey FROM t WHERE o_orderkey % 11 = 0))
        |SELECT CAST(version AS BIGINT) AS version, change_type, count(*) AS cnt,
        |  CAST(sum(d) AS BIGINT) AS delta_e2
        |FROM allr GROUP BY version, change_type
        |ORDER BY version, change_type""".stripMargin,
    // Data aggregates recomputed; n_files/n_optimize are the exact
    // trigger arithmetic (compact at append 4, then 2 more appends).
    "q123_auto_compact" ->
      """SELECT count(*) AS cnt,
        |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS cents_sum,
        |  3 AS n_files, 1 AS n_optimize
        |FROM orders""".stripMargin,
    // Final state = orders with cents halved inside the replaced range.
    "q87_replace_where" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        |  FROM orders),
        |fin AS (
        |  SELECT o_orderstatus,
        |    CASE WHEN o_orderkey BETWEEN 1000 AND 2000
        |      THEN cents // 2 ELSE cents END AS cents
        |  FROM base)
        |SELECT o_orderstatus, count(*) AS cnt,
        |  CAST(sum(cents) AS BIGINT) AS cents_sum
        |FROM fin GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // RESTORE rolls the %11 delete back, so the latest snapshot IS the
    // original table.
    "q76_restore" ->
      """SELECT o_orderstatus, count(*) AS cnt,
        |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS total_e2
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // The final population under both side tags: incremental
    // maintenance must be indistinguishable from recompute.
    "q83_incremental_view" ->
      """WITH t AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |v2 AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 7 = 0 THEN 'U' ELSE o_orderstatus END AS st,
        |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 1.1
        |         ELSE o_totalprice END AS p
        |  FROM t
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, 'N', o_totalprice / 2
        |  FROM t WHERE o_orderkey % 13 = 0),
        |v3 AS (
        |  SELECT * FROM v2 WHERE o_orderkey NOT IN
        |    (SELECT o_orderkey FROM t WHERE o_orderkey % 11 = 0)),
        |a AS (
        |  SELECT st AS o_orderstatus, count(*) AS cnt,
        |    CAST(sum(CAST(round(p * 100, 0) AS BIGINT)) AS BIGINT) AS total_e2
        |  FROM v3 GROUP BY 1)
        |SELECT side, o_orderstatus, cnt, total_e2
        |FROM a CROSS JOIN (SELECT unnest(['incremental', 'recompute']) AS side)
        |ORDER BY side, o_orderstatus""".stripMargin,
    // The q50 merge recipe's population, identical through the MoR
    // read path and after OPTIMIZE materializes it.
    "q85_mor_upsert" ->
      """WITH t AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |merged AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 7 = 0 THEN 'U' ELSE o_orderstatus END
        |      AS o_orderstatus,
        |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 1.1
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM t
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, 'N', o_totalprice / 2
        |  FROM t WHERE o_orderkey % 13 = 0),
        |a AS (
        |  SELECT o_orderstatus, count(*) AS cnt,
        |    CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
        |      AS total_e2
        |  FROM merged GROUP BY o_orderstatus)
        |SELECT side, o_orderstatus, cnt, total_e2
        |FROM a CROSS JOIN (SELECT unnest(['mor', 'optimized']) AS side)
        |ORDER BY side, o_orderstatus""".stripMargin,
    // The doubly-tombstoned population, identical through the DV read
    // path and after OPTIMIZE materializes it.
    "q84_delete_vectors" ->
      """WITH surv AS (
        |  SELECT o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey % 13 <> 0 AND o_orderkey % 17 <> 0),
        |a AS (
        |  SELECT o_orderstatus, count(*) AS cnt,
        |    CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
        |      AS total_e2
        |  FROM surv GROUP BY o_orderstatus)
        |SELECT side, o_orderstatus, cnt, total_e2
        |FROM a CROSS JOIN (SELECT unnest(['mor', 'optimized']) AS side)
        |ORDER BY side, o_orderstatus""".stripMargin,
    // One row per version: the operation label is part of the gate,
    // and n_rows checks each manifest's footer-derived row counts
    // against the true population of that version.
    "q80_history" ->
      """WITH v AS (
        |  SELECT CAST(1 AS BIGINT) AS version, 'COMMIT' AS operation,
        |    (SELECT count(*) FROM orders WHERE o_orderkey % 3 = 0) AS n_rows
        |  UNION ALL
        |  SELECT 2, 'APPEND',
        |    (SELECT count(*) FROM orders WHERE o_orderkey % 3 IN (0, 1))
        |  UNION ALL
        |  SELECT 3, 'DELETE',
        |    (SELECT count(*) FROM orders
        |     WHERE o_orderkey % 3 IN (0, 1) AND o_orderkey % 7 <> 0)
        |  UNION ALL
        |  SELECT 4, 'OPTIMIZE',
        |    (SELECT count(*) FROM orders
        |     WHERE o_orderkey % 3 IN (0, 1) AND o_orderkey % 7 <> 0)
        |  UNION ALL
        |  SELECT 5, 'RESTORE',
        |    (SELECT count(*) FROM orders WHERE o_orderkey % 3 IN (0, 1)))
        |SELECT version, operation, CAST(n_rows AS BIGINT) AS n_rows
        |FROM v ORDER BY version""".stripMargin,
    // Both kept versions hold the %13-deleted population (v3 is v2's
    // compaction); vacuum must not have changed either.
    "q81_vacuum" ->
      """WITH surv AS (
        |  SELECT o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey % 13 <> 0),
        |a AS (
        |  SELECT o_orderstatus, count(*) AS cnt,
        |    CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
        |      AS total_e2
        |  FROM surv GROUP BY o_orderstatus)
        |SELECT CAST(v AS BIGINT) AS version, o_orderstatus, cnt, total_e2
        |FROM a CROSS JOIN (SELECT unnest([2, 3]) AS v)
        |ORDER BY version, o_orderstatus""".stripMargin,
    // clone = orders with the %10 keys replaced by the merge recipe;
    // source = orders untouched (isolation across the branch point).
    "q82_shallow_clone" ->
      """WITH cl AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 10 = 0 THEN 'C' ELSE o_orderstatus END
        |      AS o_orderstatus,
        |    CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 2
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM orders),
        |sides AS (
        |  SELECT 'clone' AS side, o_orderstatus, o_totalprice FROM cl
        |  UNION ALL
        |  SELECT 'source', o_orderstatus, o_totalprice FROM orders)
        |SELECT side, o_orderstatus, count(*) AS cnt,
        |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS total_e2
        |FROM sides GROUP BY side, o_orderstatus
        |ORDER BY side, o_orderstatus""".stripMargin,
    "q77_pruned_range_read" ->
      """SELECT o_orderstatus, count(*) AS cnt,
        |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
        |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS total_e2
        |FROM orders WHERE o_orderkey BETWEEN 1000 AND 5000
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q96_zorder_commit" ->
      """WITH li AS (SELECT l_partkey, l_suppkey, l_quantity,
        |  l_extendedprice FROM lineitem),
        |a AS (SELECT 'part_band' AS side, count(*) AS cnt,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
        |  CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS cents_sum
        |  FROM li WHERE l_partkey BETWEEN 100 AND 300),
        |b AS (SELECT 'supp_band', count(*),
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT),
        |  CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
        |  FROM li WHERE l_suppkey BETWEEN 10 AND 40)
        |SELECT * FROM a UNION ALL SELECT * FROM b ORDER BY side""".stripMargin,
    "q97_metadata_agg" ->
      """SELECT CAST(count(*) AS BIGINT) AS cnt_all,
        |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
        |  CAST(sum(CASE WHEN o_orderkey % 5 = 0 THEN 0 ELSE 1 END) AS BIGINT)
        |    AS cnt_after_mor,
        |  CAST(0 AS BIGINT) AS range_known_after_mor
        |FROM orders""".stripMargin,
    "q95_bloom_point_lookup" ->
      """SELECT o_orderkey, o_orderstatus,
        |  CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        |FROM orders
        |WHERE o_orderkey IN (SELECT min(o_orderkey) FROM orders)
        |   OR o_orderkey IN (SELECT max(o_orderkey) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,
    "q93_check_constraints" ->
      """SELECT o_orderstatus, count(*) AS cnt,
        |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS cents_sum,
        |  CAST(1 AS BIGINT) AS rejected, CAST(2 AS BIGINT) AS n_constraints
        |FROM orders WHERE o_orderkey % 3 IN (0, 1)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q94_time_travel_ts" ->
      """SELECT o_orderstatus, count(*) AS cnt,
        |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
        |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS cents_sum
        |FROM orders WHERE o_orderkey % 4 IN (0, 1)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q92_incr_recluster" ->
      """WITH t AS (
        |  SELECT o_custkey, CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        |  FROM orders),
        |sides AS (
        |  SELECT 'probe' AS side, cents, o_custkey FROM t
        |    WHERE o_custkey BETWEEN 151 AND 300
        |  UNION ALL
        |  SELECT 'total', cents, o_custkey FROM t)
        |SELECT side, count(*) AS cnt, CAST(sum(cents) AS BIGINT) AS cents_sum,
        |  count(DISTINCT o_custkey) AS n_cust
        |FROM sides GROUP BY side ORDER BY side""".stripMargin,
    "q91_optimize_binpack" ->
      """SELECT o_orderstatus, count(*) AS cnt,
        |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS cents_sum,
        |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q89_column_mapping" ->
      """SELECT o_orderstatus, count(*) AS cnt,
        |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS total_e2,
        |  min(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS min_e2,
        |  max(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS max_e2
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q107_multi_term_search" ->
      """SELECT count(*) AS cnt, min(doc_id) AS min_doc,
        |  max(doc_id) AS max_doc, count(DISTINCT source) AS n_sources
        |FROM documents
        |WHERE list_contains(string_split(lower(text), ' '), 'dup')
        |  AND list_contains(string_split(lower(text), ' '), 'batch')""".stripMargin,
    "q106_format_door" ->
      """SELECT o_orderstatus, count(*) AS cnt,
        |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS cents,
        |  (SELECT count(*) FROM orders WHERE o_orderkey <= 2000) AS v1_rows
        |FROM orders WHERE o_orderkey <= 4000
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q109_phrase_search" ->
      """SELECT source, count(*) AS cnt,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM documents
        |WHERE ' ' || lower(text) || ' ' LIKE '% table hash %'
        |GROUP BY source ORDER BY source""".stripMargin,
    "q104_keyword_index" ->
      """SELECT source, count(*) AS cnt,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM documents
        |WHERE list_contains(string_split(lower(text), ' '), 'dup')
        |GROUP BY source ORDER BY source""".stripMargin,
    "q103_sql_tvf" ->
      """WITH v2 AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 5 = 0 THEN 'U' ELSE o_orderstatus END
        |      AS o_orderstatus,
        |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM orders),
        |u AS (
        |  SELECT CAST(1 AS BIGINT) AS version, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey <= 3000
        |  UNION ALL
        |  SELECT CAST(2 AS BIGINT) AS version, o_orderstatus, o_totalprice
        |  FROM v2 WHERE o_orderkey <= 3000)
        |SELECT version, o_orderstatus, count(*) AS cnt,
        |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS cents_sum,
        |  CAST(2 AS BIGINT) AS commits
        |FROM u GROUP BY version, o_orderstatus
        |ORDER BY version, o_orderstatus""".stripMargin,
    "q102_files_metadata" ->
      """SELECT CAST(8 AS BIGINT) AS n_files,
        |  CAST(count(*) AS BIGINT) AS total_rows,
        |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
        |  CAST(0 AS BIGINT) AS files_without_bytes,
        |  CAST(0 AS BIGINT) AS files_without_stats,
        |  CAST(0 AS BIGINT) AS overlapping_pairs
        |FROM orders""".stripMargin,
    "q101_wap" ->
      """SELECT o_orderstatus, count(*) AS cnt,
        |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS cents_sum,
        |  CAST(1 AS BIGINT) AS published, CAST(1 AS BIGINT) AS dropped,
        |  CAST(0 AS BIGINT) AS stages_left
        |FROM orders WHERE o_orderkey % 3 IN (0, 1)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q100_catalyst_scan" ->
      """SELECT o_orderstatus, count(*) AS cnt,
        |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
        |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS cents_sum
        |FROM orders
        |WHERE o_orderkey <= 6000 AND o_orderkey % 7 <> 0
        |  AND o_orderstatus IN ('O', 'F')
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q90_nonkey_stats_prune" ->
      """SELECT o_orderstatus, count(*) AS cnt,
        |  min(o_custkey) AS min_cust, max(o_custkey) AS max_cust,
        |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS total_e2
        |FROM orders WHERE o_custkey BETWEEN 151 AND 300
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q78_schema_evolution" ->
      """WITH v1 AS (
        |  SELECT o_orderkey, o_orderstatus, CAST(NULL AS DOUBLE) AS o_totalprice
        |  FROM orders WHERE o_orderkey % 2 = 0),
        |b2 AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 2 = 1),
        |m AS (SELECT * FROM v1 UNION ALL SELECT * FROM b2)
        |SELECT o_orderstatus, count(*) AS cnt,
        |  count(o_totalprice) AS with_price,
        |  CAST(sum(CASE WHEN o_totalprice IS NULL THEN 0
        |    ELSE CAST(round(o_totalprice * 100, 0) AS BIGINT) END) AS BIGINT)
        |    AS total_e2
        |FROM m GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // Recomputes each step's delta directly: v2's inserts/updates from
    // the mutation recipe, v3's deletes from v2's population (updated
    // prices carry the same *1.1 arithmetic, so per-row cents match
    // bitwise).
    "q74_change_feed" ->
      """WITH t AS (SELECT o_orderkey, o_totalprice FROM orders),
        |upd AS (SELECT o_orderkey, o_totalprice * 1.1 AS newp, o_totalprice AS oldp
        |  FROM t WHERE o_orderkey % 7 = 0),
        |ins AS (SELECT o_orderkey + 10000000 AS o_orderkey, o_totalprice / 2 AS newp
        |  FROM t WHERE o_orderkey % 13 = 0),
        |v2 AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 1.1
        |         ELSE o_totalprice END AS price
        |  FROM t
        |  UNION ALL SELECT o_orderkey, newp FROM ins),
        |allr AS (
        |  SELECT 2 AS version, 'insert' AS change_type,
        |    CAST(round(newp * 100, 0) AS BIGINT) AS d FROM ins
        |  UNION ALL
        |  SELECT 2, 'update', CAST(round((newp - oldp) * 100, 0) AS BIGINT) FROM upd
        |  UNION ALL
        |  SELECT 3, 'delete', CAST(round((0 - price) * 100, 0) AS BIGINT)
        |  FROM v2
        |  WHERE o_orderkey IN (SELECT o_orderkey FROM t WHERE o_orderkey % 11 = 0))
        |SELECT CAST(version AS BIGINT) AS version, change_type, count(*) AS cnt,
        |  CAST(sum(d) AS BIGINT) AS delta_e2
        |FROM allr GROUP BY version, change_type
        |ORDER BY version, change_type""".stripMargin,
    "q73_commit_expectations" ->
      """SELECT '_committed' AS metric, count(*) AS value FROM orders
        |  WHERE o_orderkey % 97 <> 0 AND o_totalprice < 400000
        |UNION ALL
        |SELECT '_quarantined', count(*) FROM orders
        |  WHERE NOT (o_orderkey % 97 <> 0 AND o_totalprice < 400000)
        |UNION ALL
        |SELECT 'violation:key_mod97', count(*) FROM orders WHERE o_orderkey % 97 = 0
        |UNION ALL
        |SELECT 'violation:price_cap', count(*) FROM orders WHERE o_totalprice >= 400000
        |ORDER BY metric""".stripMargin,
    "c01_csv_roundtrip" ->
      """SELECT p_brand, count(*) AS cnt,
        |  round(sum(p_retailprice), 2) AS total_price,
        |  CAST(sum(p_size) AS BIGINT) AS total_size
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "c03_gzip_roundtrip" ->
      """SELECT p_brand, count(*) AS cnt,
        |  round(sum(p_retailprice), 2) AS total_price,
        |  CAST(sum(p_size) AS BIGINT) AS total_size
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "p04_corrupt_records" ->
      """SELECT CASE WHEN p_partkey % 13 = 0 THEN 'corrupt' ELSE 'good' END AS kind,
        |  count(*) AS cnt,
        |  round(sum(CASE WHEN p_partkey % 13 = 0 THEN NULL ELSE p_retailprice END), 2)
        |    AS price_sum
        |FROM part GROUP BY kind ORDER BY kind""".stripMargin,
    "c02_orc_roundtrip" ->
      """SELECT o_orderstatus, count(*) AS cnt,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE o_totalprice > 1000
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "x01_salted_join" ->
      """SELECT o_orderstatus,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS cnt
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "x02_bucketed_join" ->
      """SELECT o_orderstatus, count(*) AS cnt,
        |  round(sum(l_extendedprice), 2) AS gross
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "x03_dpp_join" ->
      """WITH dim AS (
        |  SELECT DISTINCT o_orderpriority AS d_priority,
        |    CASE WHEN substr(o_orderpriority, 1, 1) IN ('1', '2')
        |      THEN 'hot' ELSE 'cold' END AS tier
        |  FROM orders)
        |SELECT o_orderpriority, count(*) AS cnt,
        |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS cents_sum
        |FROM orders JOIN dim
        |  ON o_orderpriority = d_priority AND tier = 'hot'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "m01_media_features" ->
      """SELECT doc_id AS media_id, 'text/plain' AS mime,
        |  CAST(strlen(text) AS BIGINT) AS byte_len,
        |  md5(text) AS content_hash,
        |  CAST(strlen(text) // 256 + 1 AS BIGINT) AS frames
        |FROM documents WHERE length(text) > 0 ORDER BY media_id""".stripMargin,
    // Rebuilds the same synthetic media (base text + per-doc trailer),
    // slices 64-char frames, md5s each slice, and scores Jaccard over
    // DISTINCT fingerprints — char-wise substr == byte slicing because
    // the fixture text is ASCII by construction.
    "m03_media_near_dup" ->
      """WITH d AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE doc_id < 150 AND length(text) > 0),
        |b AS (SELECT doc_id AS bid, text AS base_text FROM d WHERE doc_id % 3 = 0),
        |m AS (
        |  SELECT d.doc_id AS media_id,
        |    b.base_text || CASE WHEN d.doc_id % 3 = 0 THEN ''
        |      ELSE repeat(md5(CAST(d.doc_id AS VARCHAR)), 2) END AS content
        |  FROM d JOIN b ON b.bid = d.doc_id - d.doc_id % 3),
        |fr AS (
        |  SELECT DISTINCT media_id, md5(substr(content, CAST(i*64 + 1 AS BIGINT), 64)) AS h
        |  FROM m, unnest(range(CAST(ceil(length(content) / 64.0) AS BIGINT))) AS u(i)),
        |sz AS (SELECT media_id, count(*) AS n FROM fr GROUP BY 1),
        |sh AS (
        |  SELECT a.media_id AS ma, b.media_id AS mb, count(*) AS shared
        |  FROM fr a JOIN fr b ON a.h = b.h AND a.media_id < b.media_id
        |  GROUP BY 1, 2),
        |j AS (
        |  SELECT ma, mb, shared, x.n AS na, y.n AS nb,
        |    shared::DOUBLE / (x.n + y.n - shared) AS jc
        |  FROM sh JOIN sz x ON x.media_id = ma JOIN sz y ON y.media_id = mb)
        |SELECT ma, mb, CAST(shared AS BIGINT) AS shared,
        |  CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
        |  round(jc, 4) AS jaccard
        |FROM j WHERE jc >= 0.5 ORDER BY ma, mb""".stripMargin,
    "m04_modal_batches" ->
      """WITH items AS (
        |  SELECT doc_id, source,
        |    CASE WHEN doc_id % 4 = 0 THEN 'image' ELSE 'text' END AS modality,
        |    CASE WHEN doc_id % 4 = 0 THEN (length(text) // 256 + 1) * 64
        |         ELSE len(list_filter(string_split_regex(text, '\s+'),
        |                x -> x <> ''))
        |    END AS cost
        |  FROM documents WHERE length(text) > 0),
        |b AS (
        |  SELECT source, modality, cost,
        |    CAST((sum(cost) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) - cost) // 1024 AS BIGINT) AS batch
        |  FROM items)
        |SELECT source, batch,
        |  CAST(sum(CASE WHEN modality = 'text' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_text,
        |  CAST(sum(CASE WHEN modality = 'image' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_image,
        |  CAST(sum(cost) AS BIGINT) AS batch_cost
        |FROM b GROUP BY source, batch ORDER BY source, batch""".stripMargin,
    "m02_frame_sample" ->
      """SELECT doc_id AS media_id, CAST(i AS BIGINT) AS frame_idx,
        |  md5(text || ':' || CAST(i AS VARCHAR)) AS frame_hash
        |FROM documents, unnest(range(strlen(text) // 256 + 1)) AS u(i)
        |WHERE length(text) > 0 AND i % 4 = 0
        |ORDER BY media_id, frame_idx""".stripMargin,
    "q50_merge_upsert" ->
      """WITH t AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |src AS (
        |  SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice * 1.1 AS o_totalprice
        |  FROM t WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, 'N', o_totalprice / 2
        |  FROM t WHERE o_orderkey % 13 = 0),
        |merged AS (
        |  SELECT * FROM src
        |  UNION ALL
        |  SELECT * FROM t WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src))
        |SELECT o_orderstatus, count(*) AS cnt,
        |  round(sum(o_totalprice), 2) AS total
        |FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q67_gdpr_delete" ->
      """SELECT o_orderstatus, count(*) AS cnt,
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust,
        |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS total_e2
        |FROM orders
        |WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q72_storage_timetravel" ->
      """WITH t AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |src AS (
        |  SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice * 1.1 AS o_totalprice
        |  FROM t WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, 'N', o_totalprice / 2
        |  FROM t WHERE o_orderkey % 13 = 0),
        |v2 AS (
        |  SELECT * FROM src
        |  UNION ALL
        |  SELECT * FROM t WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src)),
        |vv AS (
        |  SELECT 1 AS version, o_orderstatus, o_totalprice FROM t
        |  UNION ALL
        |  SELECT 2 AS version, o_orderstatus, o_totalprice FROM v2)
        |SELECT CAST(version AS BIGINT) AS version, o_orderstatus, count(*) AS cnt,
        |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS total_e2
        |FROM vv GROUP BY version, o_orderstatus
        |ORDER BY version, o_orderstatus""".stripMargin,
    "q68_table_cdc" ->
      """WITH v1 AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |upd AS (SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice * 1.1 AS o_totalprice
        |  FROM v1 WHERE o_orderkey % 7 = 0),
        |ins AS (SELECT o_orderkey + 10000000 AS o_orderkey, 'N' AS o_orderstatus,
        |  o_totalprice / 2 AS o_totalprice FROM v1 WHERE o_orderkey % 13 = 0),
        |v2 AS (
        |  SELECT * FROM v1 WHERE o_orderkey % 7 <> 0 AND o_orderkey % 11 <> 0
        |  UNION ALL SELECT * FROM upd UNION ALL SELECT * FROM ins),
        |d AS (
        |  SELECT a.o_orderkey IS NOT NULL AS oldp, b.o_orderkey IS NOT NULL AS newp,
        |    a.o_orderstatus AS old_s, b.o_orderstatus AS new_s,
        |    a.o_totalprice AS old_p, b.o_totalprice AS new_p
        |  FROM v1 a FULL OUTER JOIN v2 b ON a.o_orderkey = b.o_orderkey),
        |c AS (SELECT CASE WHEN NOT oldp THEN 'insert' WHEN NOT newp THEN 'delete'
        |    WHEN old_s IS DISTINCT FROM new_s OR old_p IS DISTINCT FROM new_p THEN 'update'
        |    ELSE 'unchanged' END AS change_type, * FROM d)
        |SELECT change_type, count(*) AS cnt,
        |  CAST(sum(CAST(round((coalesce(new_p, 0) - coalesce(old_p, 0)) * 100, 0)
        |    AS BIGINT)) AS BIGINT) AS delta_e2
        |FROM c WHERE change_type <> 'unchanged'
        |GROUP BY change_type ORDER BY change_type""".stripMargin,
    "q65_scd2_asof" ->
      """WITH e AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_type
        |  FROM events),
        |c AS (
        |  SELECT user_id, event_type, ts, event_id FROM e
        |  WHERE prev_type IS NULL OR prev_type <> event_type),
        |v AS (
        |  SELECT user_id, event_type, ts,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        |  FROM c)
        |SELECT user_id, event_type AS state_at_asof,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS since
        |FROM v
        |WHERE ts <= TIMESTAMP '2024-01-15 00:00:00'
        |  AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-15 00:00:00')
        |ORDER BY user_id""".stripMargin,
    "q52_scd2_history" ->
      """WITH e AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_type
        |  FROM events),
        |c AS (
        |  SELECT user_id, event_type, ts,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to_ts
        |  FROM e WHERE prev_type IS NULL OR prev_type <> event_type)
        |SELECT user_id, event_type,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
        |  strftime(valid_to_ts, '%Y-%m-%d %H:%M:%S') AS valid_to,
        |  valid_to_ts IS NULL AS is_current
        |FROM c WHERE user_id < 30
        |ORDER BY user_id, ts""".stripMargin,
    "p02_chunk_ids" ->
      """WITH c AS (
        |  SELECT doc_id, source, length(text) AS n,
        |    unnest(range(CAST(ceil(length(text) / 40.0) AS BIGINT))) AS pos
        |  FROM documents WHERE doc_id < 20)
        |SELECT 'doc_' || doc_id || '_chunk_' || pos AS chunk_id, doc_id,
        |  CAST(pos + 1 AS BIGINT) AS chunk_number,
        |  CAST(least(40, n - pos * 40) AS BIGINT) AS chunk_len, source
        |FROM c ORDER BY doc_id, chunk_number""".stripMargin
  )
}
