package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.Events

/** Driver-facing Structured Streaming queries st1–st7 — each replays the
  * `events` fixture (or the books-JSON fixture, st6) as a file stream
  * ([[graft.streaming.Events]]), runs the streaming plan to completion,
  * and returns a deterministic batch DataFrame that the DuckDB oracle
  * checks like any other query. This makes streaming a fully
  * oracle-gated category, not a tests-only one.
  *
  *  - st1: watermark + tumbling window, APPEND mode (final windows emit
  *    because sentinel flush files advance the watermark).
  *  - st2: sliding window, APPEND + watermark (each of the two window
  *    memberships per event emits exactly once; complete mode would
  *    rewrite the whole multi-window result on every trigger).
  *  - st3: `session_window` sessionization, APPEND + watermark.
  *  - st4: stateful `dropDuplicates` dedup, APPEND, reduced to a
  *    deterministic per-type distinct-user count afterwards (which
  *    physical row survives dedup is arrival-order-dependent; the
  *    surviving KEY SET is exact).
  *  - st5: stream-static broadcast join upstream of a watermarked
  *    window aggregation.
  *  - st6: the batch Bronze/Silver ETL executed AS a stream into a
  *    parquet silver layer (same transforms, same oracle as p01).
  *  - st7: watermarked stream-stream interval join.
  *  - st8: CDC upsert — foreachBatch + Lake.mergeInto applies a
  *    time-ordered change stream to a versioned parquet layer.
  *  - st9: custom typed state via flatMapGroupsWithState
  *    (running count/total + max inter-event gap per user).
  *  - st13: st12's TTL-eviction path, driver-gated via a 3-band
  *    time-ordered replay whose watermark trajectory the oracle
  *    replays exactly.
  *  - st14: stream-stream LEFT OUTER interval join — watermark-driven
  *    null emission for view-less purchases, sentinel-flushed.
  *  - st15: stream-stream FULL OUTER interval join — BOTH sides'
  *    state eviction drives null emission (purchase-less views too).
  *  - st16: streaming change-feed tail — a file stream over the
  *    versioned table's commit log turns each landing commit into a
  *    micro-batch whose snapshot diff appends to the feed (the Delta
  *    streaming-source pattern; gated by q74's batch oracle).
  *
  * Real-data micro-batches arrive before the watermark moves (the
  * fixture file is one batch), so no real row is ever late-dropped and
  * streaming output equals the batch formulation exactly — the
  * multi-batch/late-data behaviors are exercised in StreamingSpec.
  */
/** Custom per-key streaming state for st9: running count, value total,
  * last event time and the max gap between consecutive events — the
  * max-gap needs last-event memory, which no built-in streaming
  * aggregate expresses; this is the `GroupState` use case. */
case class UserRunState(cnt: Long, total: Double, lastTs: Long, maxGap: Long)

object StreamingQueries {
  type Q = (SparkSession, String) => DataFrame

  /** st26's fixture, memoized per (sf dir, JVM), READ-ONLY for
    * consumers: a 4-version customer dimension (v1 base segments, v2
    * %10→PROMO, v3 %7→VIP, v4 deletes %13) plus the orders-derived
    * facts parquet (3 files, replayed as micro-batches; each fact's
    * as_of = (o_orderkey % 4) + 1 names the dim version current when
    * it "occurred"). */
  /** st21's replayable doc source: the docs table split into 2 parquet
    * files (2 micro-batches — enough to exercise the prior-index
    * cross-batch join; the candidate set is split-count invariant),
    * deterministic per sf dir and consumed READ-ONLY, so it builds
    * once per JVM. Everything mutable (bands/shs/cands/checkpoint)
    * stays in the caller's per-run directories. */
  private[operators] object MinhashSource {
    private val cache =
      new java.util.concurrent.ConcurrentHashMap[String, String]()

    def dir(d: String, docs: DataFrame): String =
      cache.computeIfAbsent(d, _ => {
        val p = Events.newReplayDir().resolve("mhsrc")
        docs.repartition(2).write.mode("overwrite").parquet(p.toString)
        p.toString
      })
  }

  private[operators] object TemporalFixture {
    import graft.sources.{Tables, Versioned}
    private val cache =
      new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

    def tables(s: SparkSession, d: String): (String, String) =
      cache.computeIfAbsent(d, _ => build(s, d))

    private def build(s: SparkSession, d: String): (String, String) = {
      val root = Events.newReplayDir()
      val dim = root.resolve("dim").toString
      val base = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment").as("segment"))
      Versioned.commit(s, dim, base, Some("c_custkey"))
      Versioned.mergeCommit(s, dim,
        base.filter(col("c_custkey") % 10 === 0)
          .select(col("c_custkey"), lit("PROMO").as("segment")),
        Seq("c_custkey"))
      Versioned.mergeCommit(s, dim,
        base.filter(col("c_custkey") % 7 === 0)
          .select(col("c_custkey"), lit("VIP").as("segment")),
        Seq("c_custkey"))
      Versioned.deleteWhereKeyIn(s, dim,
        base.filter(col("c_custkey") % 13 === 0).select("c_custkey"),
        "c_custkey")
      val srcDir = root.resolve("facts")
      Tables.orders(s, d)
        .select(col("o_custkey"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"),
          (col("o_orderkey") % 4 + 1).as("as_of"))
        .repartition(2).write.mode("overwrite").parquet(srcDir.toString)
      (dim, srcDir.toString)
    }
  }

  val queries: Map[String, Q] = Map(
    "st1_stream_tumbling" -> ((s, d) => {
      val ss = Events.streamingSession(s)
      val dir = Events.replayDir(ss, d, sentinels = 1)
      val ev = Events.readStream(ss, dir, maxFilesPerTrigger = 1)
        .withWatermark("ts", "10 minutes")
      Events.runToTable(ss, Events.tumblingCounts(ev), "append", "st1")
        .filter(col("event_type") =!= Events.SentinelType)
        .orderBy("window_start", "event_type")
    }),

    "st2_stream_sliding" -> ((s, d) => {
      val ss = Events.streamingSession(s)
      val dir = Events.replayDir(ss, d, sentinels = 1)
      // single ingest batch + trailing flush: the multi-batch replay
      // path is exercised by st1/st3 and StreamingSpec; here the
      // heavier (2 windows/event) state benefits from fewer commits
      val ev = Events.readStream(ss, dir)
        .withWatermark("ts", "10 minutes")
      Events.runToTable(ss, Events.slidingCounts(ev), "append", "st2")
        .filter(col("event_type") =!= Events.SentinelType)
        .orderBy("window_start", "event_type")
    }),

    "st3_stream_session" -> ((s, d) => {
      val ss = Events.streamingSession(s)
      val dir = Events.replayDir(ss, d, sentinels = 1)
      val ev = Events.readStream(ss, dir, maxFilesPerTrigger = 1)
        .withWatermark("ts", "10 minutes")
      Events.runToTable(ss, Events.sessionAgg(ev), "append", "st3")
        .filter(col("user_id") >= 0)
        .orderBy("user_id", "session_start")
    }),

    // st5: STREAM-STATIC join — the streaming events join a static
    // (batch) lookup side inside the streaming plan, then a watermarked
    // tumbling aggregation. The sentinel advances the watermark at the
    // EventTimeWatermark node upstream of the join, and the inner join
    // then drops it naturally (its type has no lookup row) — no output
    // filter needed.
    "st5_stream_static_join" -> ((s, d) => {
      val ss = Events.streamingSession(s)
      val dir = Events.replayDir(ss, d, sentinels = 1)
      val stream = Events.readStream(ss, dir)
        .withWatermark("ts", "10 minutes")
      // Stream-static join semantics re-evaluate the static subplan on
      // EVERY micro-batch; an uncached distinct here means a full events
      // scan + shuffle per trigger. Cache and materialize the (tiny)
      // lookup ONCE before start() — each batch then broadcasts from the
      // InMemoryRelation.
      val weights = graft.sources.Tables.events(ss, d)
        .select(col("event_type")).distinct()
        .withColumn("w", length(col("event_type")))
        .cache()
      weights.count()
      try {
        val joined = stream.join(broadcast(weights), "event_type")
          .groupBy(window(col("ts"), "1 hour"))
          .agg(round(sum(col("value") * col("w")), 2).as("weighted_sum"),
            count(lit(1)).as("cnt"))
          .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
            .as("window_start"), col("weighted_sum"), col("cnt"))
        Events.runToTable(ss, joined, "append", "st5")
          .orderBy("window_start")
      } finally weights.unpersist(blocking = false)
    }),

    // st6: the ETL pipeline AS a stream — the same Bronze/Silver code
    // that runs in batch (p01) consumes the books-JSON fixture through
    // readStream and lands a parquet silver layer via writeStream; the
    // read-back aggregate matches p01's oracle exactly. One engine, one
    // transform, two execution modes.
    "st6_stream_silver" -> ((s, d) => {
      val ss = Events.streamingSession(s)
      // the raw-JSON crawl dir is the same deterministic READ-ONLY
      // fixture p03 scans (PipelineQueries.RawBooksJson, memoized);
      // the JSON-sink operator itself is p01's gate — what st6
      // measures is the streamed Bronze/Silver ETL, whose silver
      // layer + checkpoint stay per-run
      val rawDir = PipelineQueries.RawBooksJson.dir(ss, d)
      val rawSchema = graft.sources.Lake.readJson(ss, rawDir).schema
      val rawStream = ss.readStream.schema(rawSchema).json(rawDir)
      val silverStream = graft.etl.Silver.fromBronze(
        graft.etl.Bronze.fromRaw(rawStream), runId = "stream")
      val runDir = Events.newReplayDir()
      val outDir = runDir.resolve("silver")
      val ckpt = runDir.resolve("ckpt")
      val q = silverStream.writeStream
        .format("parquet")
        .option("path", outDir.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.sources.Lake.readParquet(ss, outDir.toString)
        .groupBy("category")
        .agg(count(lit(1)).as("n_books"),
          round(sum("price"), 2).as("total_price"),
          sum("quantity").cast("long").as("total_qty"),
          count(when(trim(col("stock_status")) === "In stock", 1)).as("in_stock"),
          count(col("description")).as("with_desc"))
        .orderBy("category")
    }),

    // st7: STREAM-STREAM interval join — purchases join the same user's
    // views from the preceding hour, both sides watermarked, the
    // event-time range condition bounding join state. Inner-join
    // matches are exact regardless of micro-batching; the deterministic
    // reduction happens in batch on the sink.
    "st7_stream_stream_join" -> ((s, d) => {
      val ss = Events.streamingSession(s)
      val dir = Events.replayDir(ss, d, sentinels = 0)
      val ev = Events.readStream(ss, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
        .withWatermark("p_ts", "10 minutes")
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
        .withWatermark("v_ts", "10 minutes")
      val joined = purchases.join(views,
        col("p_user") === col("v_user") &&
          col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("v_ts") <= col("p_ts"))
      Events.runToTable(ss, joined, "append", "st7")
        .groupBy(col("p_user").as("user_id"))
        .agg(count(lit(1)).as("pair_cnt"))
        .orderBy(desc("pair_cnt"), col("user_id"))
        .limit(20)
    }),

    // st8: STREAMING CDC UPSERT INTO THE VERSIONED TABLE — the
    // lakehouse change-data-capture pattern: a time-ordered event
    // stream applied one micro-batch at a time via foreachBatch +
    // Versioned.mergeCommit (last-event-per-key within the batch,
    // MERGE published through the atomic commit log). Each batch
    // carries its batchId as the commit's txn id, so foreachBatch's
    // at-least-once replays are SKIPPED instead of double-merged —
    // Delta's streaming-sink idempotency, and the commit-log upgrade
    // of the old per-batch path-swap. Because batches arrive in
    // (ts, event_id) order, a key's final version lands in its last
    // containing batch, so the latest snapshot equals the batch
    // "latest event per user" — which is the oracle. The fixture is
    // split into 2 time-ordered files so the merge loop actually runs
    // multi-batch (writeReplayBands — harness-side Kafka stand-in;
    // bootstrap-commit batch + a true mergeCommit batch cover both
    // branches, and each extra band only re-runs the second).
    "st8_stream_merge_cdc" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ss = Events.streamingSession(s)
      val ev = graft.sources.Tables.events(ss, d)
      // 2-band time-ordered source: deterministic per sf dir, consumed
      // read-only → memoized (Events.memoSource); the versioned table
      // and checkpoint are the run's MUTABLE state and live in their
      // own per-run dir
      val srcDir = Events.memoSource("cdc2", d) { p =>
        Events.writeReplayBands(ev, p, 2, System.currentTimeMillis() - 600000L, "cdc")
      }
      val runDir = Events.newReplayDir()
      val table = runDir.resolve("vtable").toString
      val stream = ss.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
      val ckpt = runDir.resolve("ckpt").toString
      val q = stream.writeStream
        .foreachBatch { (batch: DataFrame, id: Long) =>
          val w = Window.partitionBy("user_id")
            .orderBy(desc("ts"), desc("event_id"))
          val upd = batch.withColumn("__rn", row_number().over(w))
            .filter(col("__rn") === 1).drop("__rn")
          val txn = Some(s"st8-$id")
          if (graft.sources.Versioned.latestVersion(ss, table) == 0)
            graft.sources.Versioned.commit(ss, table, upd,
              Some("user_id"), files = 4, txn = txn)
          else
            graft.sources.Versioned.mergeCommit(ss, table, upd,
              Seq("user_id"), txn = txn)
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.sources.Versioned.read(ss, table)
        .select(col("user_id"), col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("last_ts"),
          round(col("value"), 2).as("last_value"))
        .orderBy("user_id")
    }),

    // st9: CUSTOM STATEFUL OPERATOR — flatMapGroupsWithState with a
    // typed per-user state (UserRunState): running count, value total,
    // and max gap between consecutive events. Batches replay in
    // (ts, event_id) order (same 2-way time split as st8) and events
    // sort within the batch, so state evolves in true event order; each
    // batch emits the user's current state (Update mode), and the final
    // state per user is the row with the max count (counts are strictly
    // increasing per emission, so max_by is unambiguous). Gap math is
    // integer microseconds // 1e6 — exact cross-engine. (As in st8,
    // banding is writeReplayBands fixture prep, not the operator.)
    "st9_stream_custom_state" -> ((s, d) => {
      import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
      val ss = Events.streamingSession(s)
      import ss.implicits._
      val ev = graft.sources.Tables.events(ss, d)
      // read-only 2-band source → memoized (Events.memoSource);
      // runToTable below owns the per-run checkpoint
      val srcDir = Events.memoSource("cs2", d) { p =>
        Events.writeReplayBands(ev, p, 2, System.currentTimeMillis() - 600000L, "cs")
      }
      val stream = ss.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
        .select(col("user_id"), unix_micros(col("ts")).as("us"), col("value"))
        .as[(Long, Long, Double)]
      val updated = stream.groupByKey(_._1)
        .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
          (user: Long, it: Iterator[(Long, Long, Double)],
           st: org.apache.spark.sql.streaming.GroupState[UserRunState]) =>
            var s = st.getOption.getOrElse(UserRunState(0L, 0.0, Long.MinValue, 0L))
            it.toArray.sortBy(_._2).foreach { case (_, ts, v) =>
              val gap = if (s.cnt == 0) 0L else (ts - s.lastTs) / 1000000L
              s = UserRunState(s.cnt + 1, s.total + v, ts, math.max(s.maxGap, gap))
            }
            st.update(s)
            Iterator((user, s.cnt, s.total, s.maxGap))
        }
        .toDF("user_id", "cnt", "total", "max_gap")
      Events.runToTable(ss, updated, "update", "st9")
        .groupBy("user_id")
        .agg(max("cnt").as("n_events"),
          round(max_by(col("total"), col("cnt")), 2).as("total_value"),
          max_by(col("max_gap"), col("cnt")).as("max_gap_s"))
        .orderBy("user_id")
    }),

    // st10: COMPLETE output mode — the one mode st1–st9 don't exercise:
    // an unwatermarked windowed aggregation whose full state re-emits
    // every trigger (the live-dashboard shape; state = open windows ×
    // types, never evicted — bounded here by the fixture's time range).
    // The last complete emission feeds a batch top-3-per-window rank;
    // under AvailableNow the final table equals the all-data aggregate,
    // so the oracle is the batch formulation.
    "st10_stream_topk_complete" -> ((s, d) => {
      val ss = Events.streamingSession(s)
      val dir = Events.replayDir(ss, d, sentinels = 0)
      val counts = Events.readStream(ss, dir)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
      Events.runToTable(ss, counts, "complete", "st10")
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("window_start"), col("event_type"), col("cnt"), col("sum_value"))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("window_start")
            .orderBy(desc("cnt"), col("event_type"))).cast("long"))
        .filter(col("rk") <= 3)
        .orderBy("window_start", "rk")
    }),

    // st11: the reference's embed-and-index job AS a stream — documents
    // arrive as a file stream, each micro-batch embeds its docs
    // (foreachBatch: embedding is per-document, so no cross-batch
    // streaming state is needed — the batch-local groupBy is the whole
    // model) and APPENDS raw dense vectors to a parquet vector store;
    // retrieval then runs over the streamed index with the codegen'd
    // cosine expression. Vectors stay unnormalized integer-valued
    // doubles, so the post-stream kNN reproduces e01's batch cosines to
    // full precision — the oracle IS e01's oracle.
    "st11_stream_embed_index" -> ((s, d) => {
      import graft.vector.HashEmbed
      val ss = Events.streamingSession(s)
      val docs = graft.sources.Tables.documents(ss, d)
      // read-only 2-split doc source → memoized (Events.memoSource);
      // the sink and checkpoint are per-run
      val srcDir = Events.memoSource("embsrc", d) { p =>
        docs.repartition(2).write.mode("overwrite").parquet(p.toString)
      }
      val runDir = Events.newReplayDir()
      val sinkDir = runDir.resolve("sink")
      val ckpt = runDir.resolve("ckpt")
      val stream = ss.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
      val q = stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
          // Idempotent under foreachBatch's at-least-once contract: each
          // micro-batch overwrites its OWN deterministic per-batchId
          // partition, so a batch retry replaces rather than duplicates —
          // a blind append could double vectors and displace top-k rows.
          HashEmbed.toDenseRaw(
            HashEmbed.components(batch.select(col("doc_id"), col("text")),
              "text", Seq("doc_id")), "doc_id")
            .write.mode("overwrite")
            .parquet(sinkDir.resolve(s"batch_id=$batchId").toString)
        }
        .option("checkpointLocation", ckpt.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val probe = HashEmbed.embedLocal(graft.operators.VectorQueries.EmbedQuestion)
      val probeCol = array(probe.map(v => lit(v.toDouble)): _*)
      ss.read.parquet(sinkDir.toString)
        .select(col("doc_id"),
          graft.functions.vec_cosine_sim(col("embedding"), probeCol).as("cos"))
        .orderBy(desc("cos"), col("doc_id"))
        .limit(3)
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
        .select(col("doc_id"), round(col("cos"), 6).as("cos_sim"), col("source"))
        .orderBy(desc("cos_sim"), col("doc_id"))
    }),

    // st30: STREAMING INDEX MAINTENANCE — the persisted ANN index
    // stays fresh as the corpus streams in: each micro-batch lands its
    // vectors on a versioned corpus table (txn = batchId, so an
    // at-least-once replay commits once) and re-ensures the committed
    // IVF index over the ACCUMULATED corpus — batch 1 trains, every
    // later batch assigns ONLY its delta against the frozen centroids
    // (AnnIndex's incremental contract; the streaming twin of p07's
    // incremental RAG refresh, and what keeps retrieval serving from a
    // warm index while ingest runs at 100 TB). The emitted version
    // columns pin the story: corpus_v advances once per batch, cent_v
    // NEVER moves past 1 (no retrain), asg_v gains one delta commit.
    // Centroid training is engine-specific → rows-only; the
    // incremental ≡ full-assign law is re-pinned through this door in
    // StreamingSpec.
    "st30_stream_ann_maintain" -> ((s, d) => {
      import graft.sources.Versioned
      import graft.vector.AnnIndex
      val ss = Events.streamingSession(s)
      val emb = graft.sources.Tables.embeddings(ss, d)
        .select(col("vec_id"), col("embedding"))
      // read-only 2-wave source → memoized (Events.memoSource); the
      // corpus table, index root and checkpoint are per-run
      val srcDir = Events.memoSource("annwaves", d) { p =>
        // deterministic, stats-computable wave split (exact percentile
        // would buffer every value; min/max fold from footer stats).
        // min < cut <= max for any corpus with >= 2 distinct ids, so
        // BOTH waves are non-empty whatever the id offsets — wave 0 must
        // train (the cent_v = 1 contract)
        val mm = emb.agg(org.apache.spark.sql.functions.min("vec_id"),
          org.apache.spark.sql.functions.max("vec_id")).head()
        // overflow-safe midpoint (min + max would wrap for ids near
        // Long.MaxValue), and a single-distinct-id corpus is refused up
        // front — it cannot yield two non-empty waves, and wave 0 MUST
        // train (the cent_v = 1 contract)
        require(mm.getLong(0) < mm.getLong(1),
          "st30 needs >= 2 distinct vec_id values to split into two " +
            s"non-empty ingest waves; got min = max = ${mm.getLong(0)}")
        val cut = mm.getLong(0) + (mm.getLong(1) - mm.getLong(0)) / 2L + 1L
        Events.writeReplayFile(emb.filter(col("vec_id") < cut),
          p, "wave0", 1000000L)
        Events.writeReplayFile(emb.filter(col("vec_id") >= cut),
          p, "wave1", 2000000L)
      }
      val runDir = Events.newReplayDir()
      val corpus = runDir.resolve("anncorpus").toString
      val root = runDir.resolve("annroot").toString
      val ckpt = runDir.resolve("annckpt")
      val q = ss.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          Versioned.appendCommit(ss, corpus, batch, Some("vec_id"),
            files = 1, txn = Some(s"st30-$id"))
          AnnIndex.ensureIvf(ss, root,
            graft.sources.VersionedScan.read(ss, corpus),
            "vec_id", "embedding", k = 16)
          ()
        }
        .option("checkpointLocation", ckpt.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val asg = AnnIndex.loadIvf(ss, root)._2
      asg.select(col("vec_id"), col("cid"),
          lit(Versioned.latestVersion(ss, AnnIndex.ivfCentroidsTable(root)))
            .as("cent_v"),
          lit(Versioned.latestVersion(ss, AnnIndex.ivfAssignmentsTable(root)))
            .as("asg_v"),
          lit(Versioned.latestVersion(ss, corpus)).as("corpus_v"))
        .orderBy("vec_id")
    }),

    // st25: STREAMED CLUSTER SCORING — the model-serving half of q110:
    // fit the k-means model on the batch table (driver-held k×dim
    // matrix), then score an embedding STREAM against the frozen
    // centroids. Assignment is stateless (literal centroid arrays
    // through the codegen'd vec_l2 — the model rides the plan, no join,
    // no state store); the only stateful operator is the k-row
    // complete-mode count. This is how a 1000-executor ingest keeps
    // cluster statistics live without re-fitting: refit offline,
    // redeploy the literal model. Gate: streamed per-cluster counts ==
    // the batch assignment's counts under the shared k-means oracle.
    "st25_stream_cluster_assign" -> ((s, d) => {
      import graft.vector.KMeans
      val ss = Events.streamingSession(s)
      val emb = graft.sources.Tables.embeddings(ss, d)
      val model = KMeans.centroids(emb, k = 8, iters = 3)
      // read-only 3-split embedding source → memoized (Events.memoSource)
      val srcDir = Events.memoSource("kmsrc", d) { p =>
        emb.repartition(3).write.mode("overwrite").parquet(p.toString)
      }
      // assignment is stateless, so batch count is not semantics —
      // one ingest batch replaces three (per-micro-batch replay of a
      // stateless scorer is pinned in StreamingSpec)
      val stream = ss.readStream.schema(emb.schema).parquet(srcDir.toString)
      val counts = KMeans.assignTo(stream, model)
        .groupBy("cid").agg(count(lit(1)).as("n"))
      Events.runToTable(ss, counts, "complete", "st25").orderBy("cid")
    }),

    // st26: STREAMING TEMPORAL (AS-OF) ENRICHMENT JOIN — the Flink
    // "temporal table join" against the versioned dimension's COMMIT
    // LOG: each fact carries the dimension version current when it
    // occurred (as_of), and joins the row whose validity interval
    // contains it — not the latest snapshot, so late-arriving facts
    // enrich against the dimension AS IT WAS, the lakehouse answer to
    // slowly-changing-dimension correctness in streams. The interval
    // table is [[graft.sources.Versioned.dimensionHistory]]: the SCD2
    // expansion of the commit log (v1 snapshot + change feed + one
    // lead window — O(|dim| + |Δ|), never O(versions × dim)), built
    // once and BROADCAST, so the stream side stays stateless (no
    // watermark, no state store — unbounded-safe by construction; at
    // dimension scale the same plan shuffles once on the equi-key with
    // the interval residual riding along, q65's as-of shape). The
    // 4-version history exercises every interval shape: open [1,∞),
    // re-opened [2,·)/[3,·) upserts, and delete-closed intervals whose
    // facts correctly find NO match after version 4.
    "st26_stream_temporal_join" -> ((s, d) => {
      import graft.sources.Versioned
      val ss = Events.streamingSession(s)
      // fixture (4-version dim + replayable facts parquet) is memoized
      // and READ-ONLY; only the stream's checkpoint is per-run — bench
      // reps time the temporal join, not the dim's commit history
      val (dim, factsDir) = TemporalFixture.tables(ss, d)
      // stream-static joins RE-EVALUATE the static side every
      // micro-batch — without pinning, each batch re-reads the dim's
      // four versions and re-runs the validity window. localCheckpoint
      // materializes the history once per run; it is also the honest
      // serving shape (a temporal join serves from a prepared
      // validity-interval table, not a per-event version walk).
      val hist = Versioned.dimensionHistory(ss, dim, "c_custkey")
        .localCheckpoint(true)
      // the temporal join is stateless against the broadcast history
      // (each fact's as_of picks its interval regardless of arrival
      // batch), so the three fact files land as one ingest batch
      val stream = ss.readStream
        .schema(ss.read.parquet(factsDir).schema)
        .parquet(factsDir)
      val enriched = stream.join(broadcast(hist),
        stream("o_custkey") === hist("c_custkey") &&
          col("as_of") >= col("valid_from") && col("as_of") < col("valid_to"))
      Events.runToTable(ss, enriched.select("as_of", "segment", "cents"),
          "append", "st26")
        .groupBy("as_of", "segment")
        .agg(count(lit(1)).as("cnt"), sum("cents").cast("long").as("cents_sum"))
        .orderBy("as_of", "segment")
    }),

    // st27: STREAMED JOIN-VIEW MAINTENANCE — q115's delta algebra kept
    // CONTINUOUSLY current (the DLT materialized-view shape): the MV
    // table bootstraps as A₁⋈B (dim pinned at subscription, the
    // stream-static contract), then TAILS the fact table's commit
    // manifests (st16's file stream — O(1) metadata rows per commit);
    // each arriving version v applies ONLY its signed delta, joined
    // against the broadcast dim and folded into the MV as one
    // conflict-checked commit stamped txn="ivm-v" — so an
    // at-least-once replay of a micro-batch is skipped (the st17
    // idempotency contract), and with B static the bilinear rule
    // collapses to its single delta-bound term Δ(A⋈B) = ΔA⋈B. MV
    // refresh cost per commit = O(|delta| join) + O(view) fold, never
    // a recompute of A⋈B; the MV is itself a versioned table, so
    // downstream readers time-travel its refresh history. The gate
    // emits the maintained MV and the A₃⋈B₂ recompute under q115's
    // side tags — both must equal q115's oracle rows, proving the
    // streamed maintenance path lands exactly where batch maintenance
    // and recompute land.
    "st27_stream_join_mv" -> ((s, d) => {
      import graft.sources.Versioned
      val ss = Events.streamingSession(s)
      val (ta, tb) = PipelineQueries.JoinMvFixture.tables(ss, d)
      val root = Events.newReplayDir()
      val mv = root.resolve("mv").toString
      locally {
        val b2 = Versioned.read(ss, tb, 2)
        def aggOf(df: DataFrame) = df
          .join(b2, df("o_custkey") === b2("c_custkey"))
          .groupBy("segment")
          .agg(count(lit(1)).as("cnt"), sum("cents").cast("long").as("cents_sum"))
        Versioned.commit(ss, mv, aggOf(Versioned.read(ss, ta, 1)),
          Some("segment"), files = 1, txn = Some("ivm-1"))
        // one manifest batch: the foreachBatch body walks its versions
        // IN ORDER and folds each as its own txn-stamped commit, so
        // per-version delta application (the operator) is identical
        // whether the tail delivers versions one batch apiece or
        // together — the per-version arrival path rides st16's gate
        val manifests = ss.readStream
          .format("text").option("wholetext", "true")
          .option("pathGlobFilter", "v*.json")
          .load(ta + "/_versions")
          .select(regexp_extract(col("_metadata").getField("file_path"),
            "v(\\d{8})\\.json$", 1).cast("long").as("version"))
        val q = manifests.writeStream
          .foreachBatch { (batch: DataFrame, _: Long) =>
            val versions = batch.select("version").distinct()
              .collect().map(_.getLong(0)).filter(_ >= 2).sorted
            versions.foreach { v =>
              val txn = s"ivm-$v"
              if (!Versioned.latestTxn(ss, mv).contains(txn)) {
                val ch = Versioned.changes(ss, ta, v - 1, v, Seq("o_orderkey"))
                val dA = ch.filter(col("change_type").isin("update", "delete"))
                  .select(col("old_o_custkey").as("o_custkey"),
                    col("old_cents").as("cents"), lit(-1L).as("m"))
                  .unionByName(
                    ch.filter(col("change_type").isin("update", "insert"))
                      .select(col("new_o_custkey").as("o_custkey"),
                        col("new_cents").as("cents"), lit(1L).as("m")))
                val delta = broadcast(dA)
                  .join(b2, dA("o_custkey") === b2("c_custkey"))
                  .groupBy("segment")
                  .agg(sum(col("m")).as("dc"), sum(col("m") * col("cents")).as("dp"))
                val curV = Versioned.latestVersion(ss, mv)
                val folded = Versioned.read(ss, mv)
                  .join(delta, Seq("segment"), "full_outer")
                  .select(col("segment"),
                    (coalesce(col("cnt"), lit(0L)) + coalesce(col("dc"), lit(0L)))
                      .cast("long").as("cnt"),
                    (coalesce(col("cents_sum"), lit(0L)) +
                      coalesce(col("dp"), lit(0L))).cast("long").as("cents_sum"))
                  .filter(col("cnt") > 0)
                Versioned.commit(ss, mv, folded, Some("segment"), files = 1,
                  txn = Some(txn), expected = Some(curV))
              }
            }
          }
          .option("checkpointLocation", root.resolve("ckpt").toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val recompute = Versioned.read(ss, ta, 3)
          .join(b2, col("o_custkey") === col("c_custkey"))
          .groupBy("segment")
          .agg(count(lit(1)).as("cnt"), sum("cents").cast("long").as("cents_sum"))
          .withColumn("side", lit("recompute"))
        Versioned.read(ss, mv).withColumn("side", lit("incremental"))
          .unionByName(recompute)
          .select("side", "segment", "cnt", "cents_sum")
          .orderBy("side", "segment")
      }
    }),

    "st4_stream_dedup" -> ((s, d) => {
      val ss = Events.streamingSession(s)
      val dir = Events.replayDir(ss, d, sentinels = 0)
      val ev = Events.readStream(ss, dir)
        .withWatermark("ts", "10 minutes")
        .dropDuplicates("user_id", "event_type")
      Events.runToTable(ss, ev, "append", "st4")
        .filter(col("event_type") =!= Events.SentinelType)
        .groupBy("event_type")
        .agg(count(lit(1)).as("users"))
        .orderBy("event_type")
    }),

    // st12: BOUNDED-STATE streaming dedup — st4's dropDuplicates keeps
    // every key forever (state grows with distinct keys; on an infinite
    // stream that's an OOM countdown). dropDuplicatesWithinWatermark
    // evicts each key once the watermark passes its event time + delay,
    // so state size is bounded by the watermark window — the ONLY
    // production-safe form for unbounded key spaces. The fixture replays
    // as one batch (all state live, nothing evicted mid-run), so the
    // surviving key set equals exact distinct and st4's oracle applies
    // unchanged; the eviction path itself is timing-dependent and is
    // pinned in StreamingSpec, not here.
    "st12_stream_dedup_ttl" -> ((s, d) => {
      val ss = Events.streamingSession(s)
      val dir = Events.replayDir(ss, d, sentinels = 0)
      val ev = Events.readStream(ss, dir)
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark("user_id", "event_type")
      Events.runToTable(ss, ev, "append", "st12")
        .filter(col("event_type") =!= Events.SentinelType)
        .groupBy("event_type")
        .agg(count(lit(1)).as("users"))
        .orderBy("event_type")
    }),

    // st13: st12's EVICTION PATH, driver-gated — the semantics st12's
    // single-batch replay can't expose. The fixture replays in 3
    // time-banded micro-batches (fixed literal band boundaries, so the
    // oracle knows them); within each band a key keeps only its
    // earliest event (fixture prep — makes the emitted row's timestamp,
    // hence its TTL expiry, deterministic). Watermark algebra the
    // oracle replays (probed empirically, EvictionSemanticsSpec): state
    // expiry is judged against the LATE-EVENTS watermark, one batch
    // older than the eviction watermark — entering batch i, a key's
    // state from an emission at t is gone iff t + 2·delay <
    // max_ts(bands ≤ i−2); duplicates do NOT extend expiry. So nothing
    // is ever evicted entering batch 2, and a key re-EMITS in batch 3
    // iff its last emission is older than 2×10 min before band 1's
    // max, else the duplicate is DROPPED. Per-type emission counts ≠
    // distinct users exactly where eviction fires; if eviction broke
    // (st4 semantics), emissions would collapse to the distinct count
    // and this row turns red. Comparisons are in floor-milliseconds on
    // both sides (Spark tracks watermarks in ms).
    "st13_stream_dedup_evict" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ss = Events.streamingSession(s)
      val ev = graft.sources.Tables.events(ss, d)
      val t1 = lit("2024-01-11 00:00:00").cast("timestamp")
      val t2 = lit("2024-01-21 00:00:00").cast("timestamp")
      val banded = ev.withColumn("__band",
        when(col("ts") < t1, 1).when(col("ts") < t2, 2).otherwise(3))
      val w = Window.partitionBy("user_id", "event_type", "__band")
        .orderBy("ts", "event_id")
      val prepped = banded
        .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
        .drop("__rn")
      // read-only 3-band replay (three window passes to build) →
      // memoized (Events.memoSource); runToTable owns the checkpoint
      val srcDir = Events.memoSource("evict3", d) { p =>
        val now = System.currentTimeMillis()
        (1 to 3).foreach { i =>
          Events.writeReplayFile(prepped.filter(col("__band") === i).drop("__band"),
            p, f"evt_$i%02d", now - 600000L + i * 60000L)
        }
      }
      val stream = ss.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark("user_id", "event_type")
      Events.runToTable(ss, stream, "append", "st13")
        .groupBy("event_type")
        .agg(count(lit(1)).as("emissions"),
          countDistinct(col("user_id")).as("users"))
        .orderBy("event_type")
    }),

    // st14: STREAM-STREAM LEFT OUTER interval join — st7's inner form
    // plus the hard part: a purchase with NO views in its preceding
    // hour must still emit (null-matched), and that emission is
    // WATERMARK-DRIVEN — the row leaves join state only once the
    // watermark proves no matching view can arrive. Sentinel flush
    // files advance both sides' watermarks after the data batch so the
    // held rows emit (the production heartbeat pattern; timing itself
    // is pinned in StreamingSpec). Sentinel rows ride through both
    // sides (their type filter keeps them so the watermark node sees
    // them) and are dropped from the output by user_id sign.
    "st14_stream_outer_join" -> ((s, d) => {
      val ss = Events.streamingSession(s)
      val dir = Events.replayDir(ss, d, sentinels = 1)
      val ev = Events.readStream(ss, dir)
      val purchases = ev
        .filter(col("event_type") === "purchase" ||
          col("event_type") === Events.SentinelType)
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
        .withWatermark("p_ts", "10 minutes")
      val views = ev
        .filter(col("event_type") === "view" ||
          col("event_type") === Events.SentinelType)
        .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
        .withWatermark("v_ts", "10 minutes")
      val joined = purchases.join(views,
        col("p_user") === col("v_user") &&
          col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("v_ts") <= col("p_ts"),
        "left_outer")
      Events.runToTable(ss, joined, "append", "st14")
        .filter(col("p_user") >= 0)
        .groupBy(col("p_user").as("user_id"))
        .agg(count(col("v_user")).as("matched_pairs"),
          count(when(col("v_user").isNull, 1)).as("unmatched_purchases"))
        .orderBy("user_id")
    }),

    // st15: STREAM-STREAM FULL OUTER interval join — st14's semantics
    // on BOTH sides: a purchase with no view in its preceding hour AND
    // a view with no purchase in its following hour each emit null-
    // matched, and each emission is watermark-driven on its OWN side's
    // eviction bound (the symmetric enrichment/reconciliation shape —
    // e.g. orders vs payments where both unmatched directions are the
    // signal). Sentinel rows ride both sides to advance the
    // watermarks; a sentinel can only interval-match its own twin, and
    // the negative-key filter drops all sentinel emissions.
    "st15_stream_full_outer_join" -> ((s, d) => {
      val ss = Events.streamingSession(s)
      val dir = Events.replayDir(ss, d, sentinels = 1)
      val ev = Events.readStream(ss, dir)
      val purchases = ev
        .filter(col("event_type") === "purchase" ||
          col("event_type") === Events.SentinelType)
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
        .withWatermark("p_ts", "10 minutes")
      val views = ev
        .filter(col("event_type") === "view" ||
          col("event_type") === Events.SentinelType)
        .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
        .withWatermark("v_ts", "10 minutes")
      val joined = purchases.join(views,
        col("p_user") === col("v_user") &&
          col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("v_ts") <= col("p_ts"),
        "full_outer")
      Events.runToTable(ss, joined, "append", "st15")
        .filter(coalesce(col("p_user"), col("v_user")) >= 0)
        .groupBy(coalesce(col("p_user"), col("v_user")).as("user_id"))
        .agg(
          count(when(col("p_user").isNotNull && col("v_user").isNotNull, 1))
            .as("matched_pairs"),
          count(when(col("p_user").isNotNull && col("v_user").isNull, 1))
            .as("unmatched_purchases"),
          count(when(col("p_user").isNull, 1)).as("unmatched_views"))
        .orderBy("user_id")
    }),

    // st16: STREAMING CHANGE-FEED TAIL — the versioned table is the
    // streaming SOURCE (how a consumer tails a Delta table): its commit
    // log (_versions/) is an append-only directory of manifests, so a
    // file stream over it turns each landing commit into a micro-batch
    // (checkpoint-resumable — the cursor IS the stream's file
    // checkpoint). Only O(1) metadata rows stream; foreachBatch
    // resolves "version v arrived" into the v-1→v snapshot diff — the
    // same distributed join as q74, written idempotently per version
    // (overwrite keyed by v, so an at-least-once replay cannot double-
    // append). Three commits land with q74's exact recipe; the feed
    // read back must equal the batch change feed, so q74's oracle
    // gates it.
    "st16_stream_change_feed" -> ((s, d) => {
      import graft.sources.{Lake, Versioned}
      val ss = Events.streamingSession(s)
      val root = Events.newReplayDir()
      // the SOURCE is the shared read-only mutation fixture (same
      // history q74's oracle recomputes); only the feed output and the
      // checkpoint are per-run
      val table = PipelineQueries.OrdersMutations.table(ss, d)
      val outDir = root.resolve("feed")
      locally {
        val manifests = ss.readStream
          .format("text").option("wholetext", "true")
          .option("maxFilesPerTrigger", 1)
          .option("pathGlobFilter", "v*.json")
          .load(table + "/_versions")
          .select(regexp_extract(col("_metadata").getField("file_path"),
            "v(\\d{8})\\.json$", 1).cast("long").as("version"))
        val ckpt = root.resolve("ckpt").toString
        val q = manifests.writeStream
          .foreachBatch { (batch: DataFrame, _: Long) =>
            val versions = batch.select("version").distinct()
              .collect().map(_.getLong(0)).filter(_ >= 2).sorted
            versions.foreach { v =>
              Lake.snapshotDiff(Versioned.read(ss, table, v - 1),
                  Versioned.read(ss, table, v), Seq("o_orderkey"))
                .withColumn("version", lit(v))
                .write.mode("overwrite")
                .parquet(outDir.resolve(s"v$v").toString)
            }
          }
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        // explicit per-version paths (not a glob): the glob form makes
        // the reader probe for a _spark_metadata sink dir on the
        // pattern and log a spurious WARN stack
        val latest = Versioned.latestVersion(ss, table)
        val feedDirs = (2L to latest).map(v => outDir.resolve(s"v$v").toString)
        ss.read.option("mergeSchema", "true").parquet(feedDirs: _*)
          .groupBy(col("version").cast("long").as("version"), col("change_type"))
          .agg(count(lit(1)).as("cnt"),
            sum(round((coalesce(col("new_o_totalprice"), lit(0.0)) -
              coalesce(col("old_o_totalprice"), lit(0.0))) * 100, 0).cast("long"))
              .cast("long").as("delta_e2"))
          .orderBy("version", "change_type")
      }
    }),

    // st17: STREAMING CDC REPLICATION — the change feed APPLIED, not
    // just tailed (st16): a replica versioned table follows the source
    // by streaming the source's commit manifests, diffing each new
    // version (Lake.snapshotDiff), and applying the op-coded batch
    // with the full MERGE grammar (Lake.applyChanges) as a replica
    // commit stamped txn="apply-v" — so an at-least-once replay of a
    // micro-batch is skipped, the Delta streaming-sink idempotency
    // contract. This is cross-table replication / table mirroring
    // built ONLY from the engine's own primitives: manifest tailing,
    // CDF, MERGE apply, txn idempotency. The gate emits the replica
    // AND source aggregates; both must equal the same oracle rows —
    // the replica is indistinguishable from its source.
    "st17_stream_cdc_replicate" -> ((s, d) => {
      import graft.sources.{Lake, Versioned}
      val ss = Events.streamingSession(s)
      val root = Events.newReplayDir()
      // the SOURCE is the shared read-only mutation fixture; the
      // replica, its checkpoint and all applied commits are per-run
      val src = PipelineQueries.OrdersMutations.table(ss, d)
      val rep = root.resolve("vrep").toString
      locally {
        // replica bootstrap = the source's first snapshot
        Versioned.commit(ss, rep, Versioned.read(ss, src, 1),
          Some("o_orderkey"), txn = Some("apply-1"))
        // one manifest batch: the body replays versions in order with
        // per-version txn-stamped commits, so replication semantics are
        // batch-boundary-invariant (version-per-batch arrival: st16)
        val manifests = ss.readStream
          .format("text").option("wholetext", "true")
          .option("pathGlobFilter", "v*.json")
          .load(src + "/_versions")
          .select(regexp_extract(col("_metadata").getField("file_path"),
            "v(\\d{8})\\.json$", 1).cast("long").as("version"))
        val q = manifests.writeStream
          .foreachBatch { (batch: DataFrame, _: Long) =>
            val versions = batch.select("version").distinct()
              .collect().map(_.getLong(0)).filter(_ >= 2).sorted
            versions.foreach { v =>
              val txn = s"apply-$v"
              // replayed batches skip versions the replica already has
              if (!Versioned.latestTxn(ss, rep).contains(txn)) {
                val changes = Lake.snapshotDiff(
                    Versioned.read(ss, src, v - 1),
                    Versioned.read(ss, src, v), Seq("o_orderkey"))
                  .select(col("o_orderkey"),
                    col("new_o_orderstatus").as("o_orderstatus"),
                    col("new_o_totalprice").as("o_totalprice"),
                    when(col("change_type") === "delete", lit("D"))
                      .when(col("change_type") === "update", lit("U"))
                      .otherwise(lit("I")).as("op"))
                Versioned.commit(ss, rep,
                  Lake.applyChanges(Versioned.read(ss, rep), changes,
                    Seq("o_orderkey")),
                  Some("o_orderkey"), txn = Some(txn))
              }
            }
          }
          .option("checkpointLocation", root.resolve("ckpt").toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        def agg(side: String, table: String) = Versioned.read(ss, table)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("cnt"),
            sum(round(col("o_totalprice") * 100, 0).cast("long"))
              .cast("long").as("total_e2"))
          .withColumn("side", lit(side))
        agg("replica", rep).unionByName(agg("source", src))
          .select("side", "o_orderstatus", "cnt", "total_e2")
          .orderBy("side", "o_orderstatus")
      }
    }),

    // st18: CHAINED stateful aggregation — hourly tumbling counts
    // re-aggregated to daily max/total/hour-count in ONE streaming
    // query, two state stores deep ([[Events.chainedDailyStats]]).
    // Replayed in time-ordered micro-batches (maxFilesPerTrigger=1) so
    // BOTH levels genuinely accumulate state across batches; sentinels
    // push the watermark past the last day to flush level two. The
    // oracle is the batch recompute of the same two-level rollup —
    // chained streaming must be indistinguishable from batch.
    // st20: SNAPSHOT-THEN-TAIL — the Delta streaming source's INITIAL
    // SNAPSHOT semantics (startingVersion = earliest): a consumer that
    // subscribes to an EXISTING table first receives the whole v1
    // snapshot as `insert` rows (the backfill), then each subsequent
    // commit as its change-feed diff — one unified feed a downstream
    // materialization can apply from a cold start without a separate
    // batch backfill job. Same manifest-tailing transport and
    // per-version idempotent overwrite as st16; only the v==1 case
    // differs (a snapshot has no predecessor — it diffs against
    // nothing and lands whole as inserts). The oracle extends q74's
    // with the version-1 insert wave.
    "st20_stream_snapshot_tail" -> ((s, d) => {
      import graft.sources.{Lake, Versioned}
      val ss = Events.streamingSession(s)
      val root = Events.newReplayDir()
      val table = PipelineQueries.OrdersMutations.table(ss, d)
      val outDir = root.resolve("feed")
      locally {
        // one manifest batch: the body walks versions in order and
        // lands each as its own idempotent per-version overwrite, so
        // the feed is batch-boundary-invariant (the version-per-batch
        // arrival path is st16's gate)
        val manifests = ss.readStream
          .format("text").option("wholetext", "true")
          .option("pathGlobFilter", "v*.json")
          .load(table + "/_versions")
          .select(regexp_extract(col("_metadata").getField("file_path"),
            "v(\\d{8})\\.json$", 1).cast("long").as("version"))
        val ckpt = root.resolve("ckpt").toString
        val q = manifests.writeStream
          .foreachBatch { (batch: DataFrame, _: Long) =>
            val versions = batch.select("version").distinct()
              .collect().map(_.getLong(0)).sorted
            versions.foreach { v =>
              val delta =
                if (v == 1L)
                  Versioned.read(ss, table, 1)
                    .select(col("o_orderkey"),
                      lit(null).cast("double").as("old_o_totalprice"),
                      col("o_totalprice").as("new_o_totalprice"),
                      lit("insert").as("change_type"))
                else
                  Lake.snapshotDiff(Versioned.read(ss, table, v - 1),
                    Versioned.read(ss, table, v), Seq("o_orderkey"))
              delta.withColumn("version", lit(v))
                .write.mode("overwrite")
                .parquet(outDir.resolve(s"v$v").toString)
            }
          }
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val latest = Versioned.latestVersion(ss, table)
        val feedDirs = (1L to latest).map(v => outDir.resolve(s"v$v").toString)
        ss.read.option("mergeSchema", "true").parquet(feedDirs: _*)
          .groupBy(col("version").cast("long").as("version"), col("change_type"))
          .agg(count(lit(1)).as("cnt"),
            sum(round((coalesce(col("new_o_totalprice"), lit(0.0)) -
              coalesce(col("old_o_totalprice"), lit(0.0))) * 100, 0).cast("long"))
              .cast("long").as("delta_e2"))
          .orderBy("version", "change_type")
      }
    }),

    // st21: STREAMING NEAR-DUPLICATE DETECTION AT INGEST — the
    // streaming form of d02's MinHash+LSH: documents arrive in
    // micro-batches; each batch computes its band signatures with the
    // SAME expressions as the batch operator, emits candidate pairs
    // within the batch plus against the ACCUMULATED bucket index of
    // everything seen so far (an equi-join on (band, sig) — never
    // all-pairs), then appends its own bands to the index. Per-batch
    // cost = batch bands × matching buckets, the shape that holds when
    // ingest runs forever; a batch retry overwrites its own
    // deterministic per-batchId partitions (idempotent). Exact Jaccard
    // verification runs once at the end over the union of candidates —
    // the result must equal the batch d02 EXACTLY (pair set is
    // split-invariant: co-bucketed docs meet either in-batch or
    // cross-batch), so d02's oracle gates it.
    // st22: WAP-GATED STREAMING INGEST — write-audit-publish as the
    // per-micro-batch quality gate: each batch lands as a STAGED
    // commit (invisible), the audit runs against the WOULD-BE table
    // state (readStaged = current + batch), and only then does the
    // batch publish — atomically, with the batchId as txn id so
    // foreachBatch's at-least-once replays republish idempotently
    // (same contract as st8's MERGE sink). A failing audit would
    // dropStaged at zero table cost (that path is pinned in
    // VersionedWapSpec and hash-gated by q101); here every batch
    // passes its audit (no null users, no empty batch growth) so the
    // final table must equal the plain batch aggregate over all
    // events — band-boundary-independent, hence DuckDB-exact. The
    // marker columns pin the protocol: 3 versions (bootstrap commit +
    // 2 WAP publishes), no stage left behind. At 100 TB: the gate
    // costs the audit queries, a rejected batch costs a directory
    // delete, and the table NEVER serves unaudited rows.
    // st24: VERSION-TAIL REPLICATION through the first-class doors —
    // st17's CDC replication re-expressed as ONE line of user code:
    // `readStream.format("graft").load(src) → writeStream
    // .format("graft").start(dst)`. Offsets are commit versions, so
    // run 1 backfills the v1 snapshot and run 2 (same checkpoint, after
    // an append landed) reads ONLY the appended files — the dst version
    // count pins that: 2 versions = backfill batch + one incremental
    // batch, and the row total proves no re-emission. At 100 TB the
    // incremental batch costs O(appended data), never O(table).
    "st24_stream_graft_replicate" -> ((s, d) => {
      val ss = Events.streamingSession(s)
      val dir = Events.newReplayDir()
      val src = dir.resolve("src").toString
      val dst = dir.resolve("dst").toString
      val ckpt = dir.resolve("ckpt").toString
      val orders = graft.sources.Tables.orders(ss, d)
      def replicate(): Unit = {
        val q = ss.readStream.format("graft").load(src)
          .writeStream.format("graft")
          .option("key", "o_orderkey").option("files", "4")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start(dst)
        q.awaitTermination()
      }
      val V = graft.sources.Versioned
      V.commit(ss, src, orders.filter(col("o_orderkey") <= 3000),
        Some("o_orderkey"), files = 4)
      replicate() // backfill: the v1 snapshot
      V.appendCommit(ss, src,
        orders.filter(col("o_orderkey") > 3000 && col("o_orderkey") <= 6000),
        Some("o_orderkey"), files = 4)
      replicate() // tail: only the appended files
      s.read.format("graft").load(dst)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          sum(round(col("o_totalprice") * 100, 0).cast("long")).cast("long")
            .as("cents"))
        .withColumn("dst_versions", lit(V.latestVersion(ss, dst)))
        .orderBy("o_orderstatus")
    }),

    // st23: the FORMAT("graft") STREAMING SINK — st22's ingest flow
    // through the first-class door instead of foreachBatch: each
    // micro-batch lands as one idempotent append commit
    // (txn = graft-sink-<batchId>; GraftSourceSpec pins the replay
    // no-op), and a filtered-empty batch mints NO version (the
    // appendCommit empty-batch guard). The user-side surface is
    // exactly `stream.writeStream.format("graft").start(table)` — no
    // graft imports, no commit calls. Gate: the sunk table re-read
    // through `spark.read.format("graft")` must equal the batch
    // aggregate of the same events, and the version count must equal
    // the number of NON-EMPTY micro-batches (2 bands; the sentinel-only
    // trailing batches add nothing).
    "st23_stream_graft_sink" -> ((s, d) => {
      val ss = Events.streamingSession(s)
      val ev = graft.sources.Tables.events(ss, d)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("event_type"), col("value"))
      // read-only 2-band + sentinel source → memoized
      // (Events.memoSource); sunk table + checkpoint are per-run
      val srcDir = Events.memoSource("sink2", d) { p =>
        val now = System.currentTimeMillis()
        Events.writeReplayBands(ev, p, 2, now - 600000L, "sink")
        Events.writeReplayFile(Events.sentinelDf(ss, 0)
          .select(col("event_id"), col("user_id"), col("ts"),
            col("event_type"), col("value")),
          p, "zz_sentinel_00", now - 300000L)
      }
      val runDir = Events.newReplayDir()
      val table = runDir.resolve("vtable").toString
      val q = ss.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
        .filter(col("event_type") =!= Events.SentinelType)
        .writeStream.format("graft")
        .option("key", "event_id").option("files", "4")
        .option("checkpointLocation", runDir.resolve("ckpt").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(table)
      q.awaitTermination()
      val V = graft.sources.Versioned
      s.read.format("graft").load(table)
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"),
          sum(round(col("value") * 100, 0).cast("long")).cast("long")
            .as("value_e2"),
          countDistinct("user_id").as("n_users"))
        .withColumn("versions", lit(V.latestVersion(ss, table)))
        .orderBy("event_type")
    }),

    "st22_stream_wap_ingest" -> ((s, d) => {
      val ss = Events.streamingSession(s)
      val ev = graft.sources.Tables.events(ss, d)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("event_type"), col("value"))
      // read-only 2-band source → memoized (Events.memoSource); the
      // WAP table + checkpoint are per-run
      val srcDir = Events.memoSource("wap2", d) { p =>
        Events.writeReplayBands(ev, p, 2, System.currentTimeMillis() - 600000L, "wap")
      }
      val runDir = Events.newReplayDir()
      val table = runDir.resolve("vtable").toString
      val stream = ss.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
      val ckpt = runDir.resolve("ckpt").toString
      val q = stream.writeStream
        .foreachBatch { (batch: DataFrame, id: Long) =>
          val V = graft.sources.Versioned
          val txn = Some(s"st22-$id")
          if (V.latestVersion(ss, table) == 0) {
            V.commit(ss, table, batch, Some("event_id"), files = 4, txn = txn)
          } else if (!txn.exists(V.latestTxn(ss, table).contains(_))) {
            val before = V.read(ss, table).count()
            val sid = V.stageAppend(ss, table, batch, files = 4)
            val staged = V.readStaged(ss, table, sid)
            val audit = staged.agg(
              sum(when(col("user_id").isNull, 1).otherwise(0)).as("bad"),
              count(lit(1)).as("n")).head()
            if (audit.getLong(0) == 0L && audit.getLong(1) > before)
              V.publishStaged(ss, table, sid, txn = txn)
            else V.dropStaged(ss, table, sid)
          }
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val V = graft.sources.Versioned
      val wapOps = V.history(ss, table).filter(col("operation") === "WAP PUBLISH")
        .count()
      V.read(ss, table)
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"),
          sum(round(col("value") * 100, 0).cast("long")).cast("long")
            .as("value_e2"),
          countDistinct("user_id").as("n_users"))
        .withColumn("wap_publishes", lit(wapOps))
        .withColumn("stages_left", lit(V.stagedIds(ss, table).size.toLong))
        .orderBy("event_type")
    }),

    "st21_stream_minhash_dedup" -> ((s, d) => {
      import graft.dedup.Dedup
      val ss = Events.streamingSession(s)
      val docs = graft.sources.Tables.documents(ss, d)
        .select(col("doc_id"), col("text"))
      // the 2-split doc source is deterministic per sf dir and consumed
      // read-only — memoized like the replay dirs; the result is
      // split-count invariant (every dup pair is either within-batch
      // or cross-batch-vs-prior). Index/checkpoint dirs stay per-run.
      val srcDir = MinhashSource.dir(d, docs)
      val runDir = java.nio.file.Files.createDirectories(java.nio.file.Paths.get(
        "target", "stream", "mhrun_" +
          java.util.UUID.randomUUID().toString.replace("-", "").take(12)))
      val bandsDir = runDir.resolveSibling(runDir.getFileName.toString + "_bands")
      val shsDir = runDir.resolveSibling(runDir.getFileName.toString + "_shs")
      val candsDir = runDir.resolveSibling(runDir.getFileName.toString + "_cands")
      val ckpt = runDir.resolveSibling(runDir.getFileName.toString + "_ckpt")
      val stream = ss.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
      val q = stream.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val docsh = Dedup.shingleArrays(
              batch.select(col("doc_id"), col("text")), "doc_id", "text")
            .localCheckpoint(true) // eager: Dedup.minHashNearDups note
          val bands = Dedup.bandSignaturesOf(docsh).localCheckpoint(true) // eager: Dedup.minHashNearDups note
          // prior index = batches STRICTLY before this one (a retry of
          // batch N must not join against its own half-written state)
          val priorDirs = Option(new java.io.File(bandsDir.toString).listFiles())
            .getOrElse(Array.empty).toSeq
            .filter(f => f.getName.startsWith("batch_id=") &&
              f.getName.drop(9).toLong < batchId)
            .map(_.toString)
          val within = Dedup.lshCandidates(bands)
          val cands = if (priorDirs.isEmpty) within else {
            val prior = ss.read.parquet(priorDirs: _*)
            val cross = bands
              .select(col("band").as("band_a"), col("sig").as("sig_a"),
                col("id").as("ia"))
              .join(prior.select(col("band").as("band_b"),
                col("sig").as("sig_b"), col("id").as("ib")),
                col("band_a") === col("band_b") &&
                  col("sig_a") === col("sig_b"))
              .select(least(col("ia"), col("ib")).as("da"),
                greatest(col("ia"), col("ib")).as("db"))
              .distinct()
            within.unionByName(cross)
          }
          cands.write.mode("overwrite")
            .parquet(candsDir.resolve(s"batch_id=$batchId").toString)
          bands.write.mode("overwrite")
            .parquet(bandsDir.resolve(s"batch_id=$batchId").toString)
          docsh.write.mode("overwrite")
            .parquet(shsDir.resolve(s"batch_id=$batchId").toString)
        }
        .option("checkpointLocation", ckpt.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val allCands = ss.read.parquet(candsDir.toString)
        .select("da", "db").distinct()
      val allSh = ss.read.parquet(shsDir.toString).select("id", "shs")
      Dedup.jaccardVerifyArrays(allCands, allSh)
        .filter(col("jaccard") >= 0.5)
        .select(col("da"), col("db"), round(col("jaccard"), 4).as("jac"))
        .orderBy("da", "db")
    }),

    "st18_stream_chained_agg" -> ((s, d) => {
      val ss = Events.streamingSession(s)
      val dir = Events.replayDir(ss, d, sentinels = 1)
      val ev = Events.readStream(ss, dir, maxFilesPerTrigger = 1)
        .withWatermark("ts", "10 minutes")
      Events.runToTable(ss, Events.chainedDailyStats(ev), "append", "st18")
        .filter(col("event_type") =!= Events.SentinelType)
        .orderBy("day", "event_type")
    }),

    // st19: stream-stream JOIN chained into a windowed AGGREGATION in
    // one streaming query — the OTHER multi-stateful composition (st18
    // chains agg→agg; this chains join→agg): st7's interval join
    // (views within the hour before each purchase) feeds an hourly
    // per-user pair count without landing the join anywhere. Sentinels
    // ride BOTH sides (each can only interval-match its own twin, so
    // they advance both watermarks without polluting real pairs) and
    // their far-future window rows filter out on user_id like every
    // sentinel row. The oracle is the batch join + window recompute —
    // the fused two-operator pipeline must be indistinguishable from
    // the two-job form it replaces.
    "st19_stream_join_agg" -> ((s, d) => {
      val ss = Events.streamingSession(s)
      val dir = Events.replayDir(ss, d, sentinels = 1)
      // REPLAY SLICE: the interval join's state holds every surviving
      // row of both sides, and the flush re-walks that state for
      // eviction — a 1/3 user slice cuts the replay floor without
      // touching the operator chain (join condition, watermarks,
      // two-stage flush all identical; the DuckDB oracle applies the
      // same slice). Sentinels must keep FLOWING (their user_id is
      // out-of-slice), so the slice ORs the sentinel type through.
      // Single ingest batch: the trailing no-data batch carries both
      // flush hops (join eviction → agg emission) under the advanced
      // watermark; per-batch state accumulation is st18's gate.
      val ev = Events.readStream(ss, dir)
        .filter(col("user_id") % 3 === 0 ||
          col("event_type") === Events.SentinelType)
      val purchases = ev
        .filter(col("event_type") === "purchase" ||
          col("event_type") === Events.SentinelType)
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
        .withWatermark("p_ts", "10 minutes")
      val views = ev
        .filter(col("event_type") === "view" ||
          col("event_type") === Events.SentinelType)
        .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
        .withWatermark("v_ts", "10 minutes")
      val joined = purchases.join(views,
        col("p_user") === col("v_user") &&
          col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("v_ts") <= col("p_ts"))
      val agg = joined
        .groupBy(window(col("p_ts"), "1 hour"), col("p_user"))
        .agg(count(lit(1)).as("pair_cnt"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("p_user").as("user_id"), col("pair_cnt"))
      Events.runToTable(ss, agg, "append", "st19")
        .filter(col("user_id") >= 0)
        .orderBy("window_start", "user_id")
    }),

    // st28: STREAMING CHANGE FEED through the format door —
    // readStream.format("graft").option("readChangeFeed", true): each
    // micro-batch emits the CHANGE EVENTS of its version range
    // (keyed diffs, Delta's CDF streaming), with the first batch
    // emitting the table's creation as inserts. Contrast st16, which
    // hand-builds this tailing from the manifest glob + foreachBatch:
    // the option makes it one line, and — because events are diffs —
    // a rewrite-only commit (OPTIMIZE) emits nothing instead of
    // demanding ignoreChanges (pinned in GraftSourceSpec).
    // maxVersionsPerTrigger=1 replays the shared fixture's history as
    // one version per batch; the result equals q127's creation +
    // change algebra — same oracle.
    "st28_stream_cdf_door" -> ((s, d) => {
      val ss = Events.streamingSession(s)
      val root = Events.newReplayDir()
      val table = PipelineQueries.OrdersMutations.table(ss, d)
      val out = root.resolve("cdf_out").toString
      locally {
        val q = ss.readStream.format("graft")
          .option("readChangeFeed", "true")
          .option("maxVersionsPerTrigger", 1)
          .load(table)
          .writeStream.format("parquet")
          .option("path", out)
          .option("checkpointLocation", root.resolve("ckpt").toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      ss.read.parquet(out)
        .groupBy(col("version").cast("long").as("version"), col("change_type"))
        .agg(count(lit(1)).as("cnt"),
          sum(round((coalesce(col("new_o_totalprice"), lit(0.0)) -
            coalesce(col("old_o_totalprice"), lit(0.0))) * 100, 0).cast("long"))
            .cast("long").as("delta_e2"))
        .orderBy("version", "change_type")
    }),

    // st29: STREAMING DRIFT MONITORING — the streaming twin of q136's
    // PSI gate, the data-quality monitor a live ingest pipeline runs:
    // a BATCH baseline histogram of the value distribution (yesterday's
    // profile; tiny, broadcast) joins the stream BEFORE aggregation
    // (p_base is functionally dependent on the bin, so it rides the
    // first grouping key), hourly windowed bin counts form the first
    // stateful aggregation, and a second chained aggregation folds
    // each window's bins into ONE drift row. The per-bin PSI
    // contributions are rounded to integer MICRO-units before summing
    // (both engines sum exact integers — float addition order can
    // never flip the hash), and the fold runs over a bin-sorted
    // array, all staged as columns per the interpreted-HOF rule.
    // State is bounded: 10 bins × open windows, then one row per
    // window. A drifting hour surfaces as psi_micro spiking — the
    // alarm fires while the batch job would still be reading
    // yesterday.
    "st29_stream_drift" -> ((s, d) => {
      val ss = Events.streamingSession(s)
      // ONE sentinel + the trailing no-data micro-batch cover the
      // two-stage flush (noDataMicroBatches, on by default in
      // AvailableNow). Sentinel rows must FLOW THROUGH both
      // aggregations (a pre-watermark filter gets pushed below the
      // EventTimeWatermark node and the watermark never advances —
      // the st19 convention); their far-future windows filter out of
      // the RESULT instead.
      val dir = Events.replayDir(ss, d, sentinels = 1)
      def bin(c: org.apache.spark.sql.Column) =
        least(lit(9L), floor(c / 50).cast("long"))
      val base0 = graft.sources.Tables.events(ss, d)
        .withColumn("bin", bin(col("value")))
        .groupBy("bin").agg(count(lit(1)).as("n_base"))
      val baseP = base0
        .crossJoin(broadcast(base0.agg(sum("n_base").as("tb"))))
        .select(col("bin"),
          ((col("n_base") + 0.5) / (col("tb") + 5.0)).as("p_base"))
      // single ingest batch (events + sentinel together): the batch's
      // end-of-batch watermark lands past the sentinel, and the
      // trailing no-data batch walks BOTH flush hops — agg1's final
      // windows flow into agg2 and agg2 emits under the same advanced
      // watermark. Per-batch accumulation is st18's gate.
      val ev = Events.readStream(ss, dir)
        .withWatermark("ts", "10 minutes")
        .withColumn("bin", bin(col("value")))
        .join(broadcast(baseP), Seq("bin"))
      val counts = ev
        .groupBy(window(col("ts"), "1 hour"), col("bin"), col("p_base"))
        .agg(count(lit(1)).as("n_cur"))
      val drift = counts
        .groupBy(window(col("window"), "1 hour"))
        .agg(sort_array(collect_list(struct(col("bin"), col("n_cur"),
          col("p_base")))).as("bins"))
        .withColumn("tc",
          expr("aggregate(bins, 0L, (a, x) -> a + x.n_cur)"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
            .as("window_start"),
          col("tc"),
          expr("""aggregate(bins, 0L, (a, x) -> a + cast(round(
            (((x.n_cur + 0.5) / (tc + 5.0)) - x.p_base) *
            ln(((x.n_cur + 0.5) / (tc + 5.0)) / x.p_base) * 1000000.0,
            0) as long))""").as("psi_micro"))
      Events.runToTable(ss, drift, "append", "st29")
        .filter(col("window_start") < "2090-01-01") // sentinel windows
        .orderBy("window_start")
    })
  )

  val oracles: Map[String, String] = Map(
    // Batch recompute of baseline → hourly histogram → integer-micro
    // PSI fold; contributions round to micro-units BEFORE summation in
    // both engines, so the sum is order-free integer arithmetic.
    "st29_stream_drift" ->
      """WITH bfull AS (
        |  SELECT least(9, CAST(floor(value / 50) AS BIGINT)) AS bin
        |  FROM events),
        |base AS (SELECT bin, count(*) AS n_base FROM bfull GROUP BY 1),
        |bp AS (SELECT bin,
        |    (n_base + 0.5) / ((SELECT sum(n_base) FROM base) + 5.0)
        |      AS p_base FROM base),
        |cur AS (
        |  SELECT date_trunc('hour', ts) AS w,
        |    least(9, CAST(floor(value / 50) AS BIGINT)) AS bin,
        |    count(*) AS n_cur
        |  FROM events GROUP BY 1, 2),
        |j AS (SELECT w, c.bin, n_cur, p_base FROM cur c JOIN bp USING (bin)),
        |t AS (SELECT w, CAST(sum(n_cur) AS BIGINT) AS tc FROM j GROUP BY 1)
        |SELECT strftime(j.w, '%Y-%m-%d %H:%M:%S') AS window_start, t.tc,
        |  CAST(sum(CAST(round((((n_cur + 0.5) / (tc + 5.0)) - p_base) *
        |    ln(((n_cur + 0.5) / (tc + 5.0)) / p_base) * 1000000.0, 0)
        |    AS BIGINT)) AS BIGINT) AS psi_micro
        |FROM j JOIN t USING (w) GROUP BY j.w, t.tc
        |ORDER BY window_start""".stripMargin,
    // Batch recompute of the two-level rollup: hourly counts per type,
    // then per-day max/total/hours.
    "st18_stream_chained_agg" ->
      """WITH h AS (
        |  SELECT date_trunc('hour', ts) AS hr, event_type, count(*) AS cnt
        |  FROM events GROUP BY 1, 2)
        |SELECT strftime(date_trunc('day', hr), '%Y-%m-%d') AS day, event_type,
        |  max(cnt) AS max_hourly, CAST(sum(cnt) AS BIGINT) AS total,
        |  count(*) AS n_hours
        |FROM h GROUP BY date_trunc('day', hr), event_type
        |ORDER BY day, event_type""".stripMargin,
    // Batch recompute of the fused join→window pipeline.
    "st19_stream_join_agg" ->
      """SELECT strftime(date_trunc('hour', p.ts), '%Y-%m-%d %H:%M:%S')
        |    AS window_start,
        |  p.user_id AS user_id, count(*) AS pair_cnt
        |FROM (SELECT user_id, ts FROM events
        |      WHERE event_type = 'purchase' AND user_id % 3 = 0) p
        |JOIN (SELECT user_id, ts FROM events
        |      WHERE event_type = 'view' AND user_id % 3 = 0) v
        |  ON p.user_id = v.user_id
        | AND v.ts >= p.ts - INTERVAL '1 hour' AND v.ts <= p.ts
        |GROUP BY 1, p.user_id ORDER BY window_start, p.user_id""".stripMargin,
    // Identical semantics to q25's oracle — the tumbling window is the
    // same expression in batch and streaming.
    "st1_stream_tumbling" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |  event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    // Every event belongs to exactly two 1h/30m sliding windows: the one
    // starting at its 30-minute bucket and the one 30 minutes earlier.
    "st2_stream_sliding" ->
      """WITH e2 AS (
        |  SELECT event_type, time_bucket(INTERVAL '30 minutes', ts) AS s FROM events
        |  UNION ALL
        |  SELECT event_type,
        |         time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' FROM events)
        |SELECT strftime(s, '%Y-%m-%d %H:%M:%S') AS window_start,
        |  event_type, count(*) AS cnt
        |FROM e2 GROUP BY s, event_type ORDER BY window_start, event_type""".stripMargin,
    // Spark session_window semantics: a gap of exactly the duration
    // STARTS a new session (window is [start, last+gap)), and session
    // end = last event + gap.
    "st3_stream_session" ->
      """WITH x AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |      OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts))
        |         >= 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM events),
        |y AS (
        |  SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM x)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(max(ts) + INTERVAL '30 minutes', '%Y-%m-%d %H:%M:%S') AS session_end,
        |  count(*) AS cnt
        |FROM y GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "st4_stream_dedup" ->
      """SELECT event_type, count(DISTINCT user_id) AS users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // Single-batch replay keeps all TTL state live, so bounded-state
    // dedup lands on exact distinct — same oracle as st4. The eviction
    // path is driver-gated by st13.
    "st12_stream_dedup_ttl" ->
      """SELECT event_type, count(DISTINCT user_id) AS users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // Replays the dedup state machine over the 3 fixed bands: per key
    // and band the earliest event (the fixture prep). State expiry is
    // judged against the LATE-EVENTS watermark (one batch older than
    // the eviction watermark — probed in EvictionSemanticsSpec), so
    // entering band i a key's state is gone iff its last emission
    // + 20 min < max ts of bands ≤ i−2: nothing evicts entering band
    // 2, band 3 re-admits keys whose emission is 20 min older than
    // band 1's max. All in floor-milliseconds — Spark tracks
    // watermarks in ms. If eviction never fired, emissions would equal
    // users and the hash would diverge.
    "st13_stream_dedup_evict" ->
      """WITH p AS (
        |  SELECT user_id, event_type,
        |    CASE WHEN ts < TIMESTAMP '2024-01-11 00:00:00' THEN 1
        |         WHEN ts < TIMESTAMP '2024-01-21 00:00:00' THEN 2 ELSE 3 END AS band,
        |    min(epoch_ns(ts) // 1000000) AS tms
        |  FROM events GROUP BY 1, 2, 3),
        |m AS (
        |  SELECT max(CASE WHEN band = 1 THEN tms END) AS m1 FROM p),
        |k AS (
        |  SELECT user_id, event_type,
        |    max(CASE WHEN band = 1 THEN tms END) AS b1,
        |    max(CASE WHEN band = 2 THEN tms END) AS b2,
        |    max(CASE WHEN band = 3 THEN tms END) AS b3
        |  FROM p GROUP BY 1, 2),
        |e AS (
        |  SELECT user_id, event_type, b1, b2, b3, m1,
        |    (b1 IS NOT NULL) AS e1,
        |    (b2 IS NOT NULL AND b1 IS NULL) AS e2
        |  FROM k, m),
        |f AS (
        |  SELECT user_id, event_type, e1, e2,
        |    (b3 IS NOT NULL AND
        |     (CASE WHEN e2 THEN b2 ELSE b1 END IS NULL
        |      OR CASE WHEN e2 THEN b2 ELSE b1 END + 1200000 < m1)) AS e3
        |  FROM e)
        |SELECT event_type,
        |  CAST(sum(CAST(e1 AS INT) + CAST(e2 AS INT) + CAST(e3 AS INT)) AS BIGINT)
        |    AS emissions,
        |  count(DISTINCT user_id) AS users
        |FROM f GROUP BY event_type ORDER BY event_type""".stripMargin,
    // Batch equivalence: the left join with the identical interval
    // predicate — every purchase appears, null-matched when no view
    // precedes it within the hour.
    "st14_stream_outer_join" ->
      """SELECT p.user_id, count(v.user_id) AS matched_pairs,
        |  count(CASE WHEN v.user_id IS NULL THEN 1 END) AS unmatched_purchases
        |FROM (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'view') v
        |  ON p.user_id = v.user_id
        | AND v.ts >= p.ts - INTERVAL '1 hour' AND v.ts <= p.ts
        |GROUP BY p.user_id ORDER BY p.user_id""".stripMargin,
    // Batch equivalence: the FULL join with the identical interval
    // predicate — both unmatched directions appear null-matched.
    "st15_stream_full_outer_join" ->
      """SELECT coalesce(p.user_id, v.user_id) AS user_id,
        |  count(CASE WHEN p.user_id IS NOT NULL AND v.user_id IS NOT NULL
        |    THEN 1 END) AS matched_pairs,
        |  count(CASE WHEN p.user_id IS NOT NULL AND v.user_id IS NULL
        |    THEN 1 END) AS unmatched_purchases,
        |  count(CASE WHEN p.user_id IS NULL THEN 1 END) AS unmatched_views
        |FROM (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
        |FULL JOIN (SELECT user_id, ts FROM events WHERE event_type = 'view') v
        |  ON p.user_id = v.user_id
        | AND v.ts >= p.ts - INTERVAL '1 hour' AND v.ts <= p.ts
        |GROUP BY 1 ORDER BY user_id""".stripMargin,
    "st5_stream_static_join" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |  round(sum(value * length(event_type)), 2) AS weighted_sum,
        |  count(*) AS cnt
        |FROM events GROUP BY 1 ORDER BY window_start""".stripMargin,
    // Same expected result as p01 — the streamed silver layer must agree
    // with the batch pipeline.
    "st6_stream_silver" ->
      """SELECT p_brand AS category, count(*) AS n_books,
        |  round(sum(p_retailprice), 2) AS total_price,
        |  CAST(sum(CASE WHEN p_size % 7 = 0 THEN 0 ELSE p_size END) AS BIGINT) AS total_qty,
        |  count(CASE WHEN p_size % 7 <> 0 THEN 1 END) AS in_stock,
        |  count(CASE WHEN p_partkey % 5 <> 0 THEN 1 END) AS with_desc
        |FROM part GROUP BY p_brand ORDER BY category""".stripMargin,
    // Identical retrieval semantics to e01 — the streamed index stores
    // raw integer-valued components, so the cosines match bit-for-bit.
    "st11_stream_embed_index" -> VectorQueries.oracles("e01_hash_embed_knn"),
    // streamed scoring against the frozen model == the batch
    // assignment's per-cluster counts (shared k-means algebra)
    "st25_stream_cluster_assign" -> (VectorQueries.kmeansAssignCte +
      """
        |SELECT cid, count(*) AS n FROM fin GROUP BY cid ORDER BY cid""".stripMargin),
    // The streamed feed must equal the batch change feed over the same
    // three commits — q74's oracle verbatim.
    "st16_stream_change_feed" -> PipelineQueries.oracles("q74_change_feed"),
    // the streamed door replays creation + changes — q127's algebra
    "st28_stream_cdf_door" -> PipelineQueries.oracles("q127_cdf_format_door"),
    // The streamed MV must land exactly where q115's batch maintenance
    // and the recompute land — q115's oracle verbatim.
    "st27_stream_join_mv" ->
      PipelineQueries.oracles("q115_incremental_join_view"),
    // Temporal join: each fact resolves the segment current at ITS
    // as_of version (v1 base, v2 %10→PROMO, v3 %7→VIP, v4 deletes %13
    // — deleted keys match nothing at as_of=4).
    "st26_stream_temporal_join" ->
      """WITH f AS (
        |  SELECT o_custkey,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
        |    (o_orderkey % 4) + 1 AS as_of
        |  FROM orders),
        |seg AS (
        |  SELECT c_custkey, c_mktsegment AS s1,
        |    CASE WHEN c_custkey % 10 = 0 THEN 'PROMO'
        |         ELSE c_mktsegment END AS s2,
        |    CASE WHEN c_custkey % 7 = 0 THEN 'VIP'
        |         WHEN c_custkey % 10 = 0 THEN 'PROMO'
        |         ELSE c_mktsegment END AS s3
        |  FROM customer),
        |j AS (
        |  SELECT as_of,
        |    CASE as_of WHEN 1 THEN s1 WHEN 2 THEN s2 ELSE s3 END AS segment,
        |    cents
        |  FROM f JOIN seg ON f.o_custkey = seg.c_custkey
        |  WHERE NOT (as_of = 4 AND c_custkey % 13 = 0))
        |SELECT as_of, segment, count(*) AS cnt,
        |  CAST(sum(cents) AS BIGINT) AS cents_sum
        |FROM j GROUP BY 1, 2 ORDER BY as_of, segment""".stripMargin,
    // batch-equivalence gate: the streamed ingest-time near-dup pass
    // must produce EXACTLY the batch operator's verified pairs
    "st21_stream_minhash_dedup" -> DedupQueries.oracles("d02_minhash_lsh"),
    // the replicated table equals the source slice; dst_versions = 2
    // (one backfill batch + one incremental batch, nothing re-emitted)
    "st24_stream_graft_replicate" ->
      """SELECT o_orderstatus, count(*) AS cnt,
        |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS cents,
        |  CAST(2 AS BIGINT) AS dst_versions
        |FROM orders WHERE o_orderkey <= 6000
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // the sunk table equals the batch aggregate; versions = the 3
    // non-empty micro-batches (the sentinel-only batch mints none)
    "st23_stream_graft_sink" ->
      """SELECT event_type, count(*) AS cnt,
        |  CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS value_e2,
        |  count(DISTINCT user_id) AS n_users,
        |  CAST(2 AS BIGINT) AS versions
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "st22_stream_wap_ingest" ->
      """SELECT event_type, count(*) AS cnt,
        |  CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS value_e2,
        |  count(DISTINCT user_id) AS n_users,
        |  CAST(1 AS BIGINT) AS wap_publishes,
        |  CAST(0 AS BIGINT) AS stages_left
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // q74's change-feed oracle extended with the version-1 backfill
    // wave: every v1 row arrives as an insert whose delta is its full
    // price
    "st20_stream_snapshot_tail" ->
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
    // The source's final population (merge recipe then the %11 delete),
    // required identically from the replica and the source.
    "st17_stream_cdc_replicate" ->
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
        |FROM a CROSS JOIN (SELECT unnest(['replica', 'source']) AS side)
        |ORDER BY side, o_orderstatus""".stripMargin,
    "st10_stream_topk_complete" ->
      """WITH c AS (
        |  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |    event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY window_start
        |    ORDER BY cnt DESC, event_type) AS rk
        |  FROM c)
        |SELECT window_start, event_type, cnt, sum_value, CAST(rk AS BIGINT) AS rk
        |FROM r WHERE rk <= 3 ORDER BY window_start, rk""".stripMargin,
    "st9_stream_custom_state" ->
      """WITH g AS (
        |  SELECT user_id, value,
        |    epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
        |      AS gap
        |  FROM events)
        |SELECT user_id, count(*) AS n_events,
        |  round(sum(value), 2) AS total_value,
        |  CAST(coalesce(max(gap) // 1000000, 0) AS BIGINT) AS max_gap_s
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,
    "st8_stream_merge_cdc" ->
      """WITH last AS (
        |  SELECT user_id, event_type, ts, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC)
        |      AS rn
        |  FROM events)
        |SELECT user_id, event_type,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
        |  round(value, 2) AS last_value
        |FROM last WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "st7_stream_stream_join" ->
      """SELECT p.user_id, count(*) AS pair_cnt
        |FROM (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
        |JOIN (SELECT user_id, ts FROM events WHERE event_type = 'view') v
        |  ON p.user_id = v.user_id
        | AND v.ts >= p.ts - INTERVAL '1 hour' AND v.ts <= p.ts
        |GROUP BY p.user_id ORDER BY pair_cnt DESC, p.user_id LIMIT 20""".stripMargin
  )
}
