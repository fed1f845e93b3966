package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Tables

/** Batch-equivalence oracle (SURVEY.md §5.2): the SAME transformation
  * applied to a batch read and to a multi-micro-batch streaming replay
  * must agree; and watermarking must actually drop late data. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  /** events as raw rows (ts still nanos-long) ordered by ts. */
  private lazy val rawEvents: DataFrame =
    spark.read.schema(Events.rawSchema).parquet(s"$sf/events.parquet")

  /** Replay dir with events split into `parts` time-ordered files plus
    * trailing sentinels; maxFilesPerTrigger=1 → one micro-batch each. */
  private def splitReplay(parts: Int, sentinels: Int): String = {
    val dir = Events.newReplayDir()
    val now = System.currentTimeMillis()
    val withPart = rawEvents.orderBy("ts")
      .withColumn("part", ntile(parts).over(
        org.apache.spark.sql.expressions.Window.orderBy("ts")))
    (1 to parts).foreach { p =>
      Events.writeReplayFile(
        withPart.filter(col("part") === p).drop("part"),
        dir, f"ev_$p%02d", now - 600000L + p * 1000L)
    }
    (0 until sentinels).foreach { i =>
      Events.writeReplayFile(Events.sentinelDf(spark, i), dir, f"zz_$i%02d",
        now - 60000L + i * 1000L)
    }
    dir.toString
  }

  private def collectSorted(df: DataFrame): Seq[Row] =
    df.collect().toSeq.sortBy(_.mkString("|"))

  test("tumbling windows: 3-batch streaming replay equals the batch plan") {
    val dir = splitReplay(parts = 3, sentinels = 2)
    val stream = Events.readStream(spark, dir, maxFilesPerTrigger = 1)
      .withWatermark("ts", "10 minutes")
    val streamed = Events.runToTable(spark, Events.tumblingCounts(stream), "append", "eqt")
      .filter(col("event_type") =!= Events.SentinelType)
    val batch = Events.tumblingCounts(Tables.events(spark, sf))
    assert(collectSorted(streamed) == collectSorted(batch))
  }

  test("session windows: 3-batch streaming replay equals the batch plan") {
    val dir = splitReplay(parts = 3, sentinels = 2)
    val stream = Events.readStream(spark, dir, maxFilesPerTrigger = 1)
      .withWatermark("ts", "10 minutes")
    val streamed = Events.runToTable(spark, Events.sessionAgg(stream), "append", "eqs")
      .filter(col("user_id") >= 0)
    val batch = Events.sessionAgg(Tables.events(spark, sf))
    assert(collectSorted(streamed) == collectSorted(batch))
  }

  test("watermark drops late data in append mode") {
    // batch 1: all real events; batch 2: a flush sentinel (advances the
    // late-record filter watermark — under the default
    // statefulOperator.allowMultiple=true, Spark's late filter uses a
    // watermark that LAGS eviction by one batch, so a late row arriving
    // in the immediately-next batch would still be admitted; that
    // one-directional guarantee is Spark-documented behavior); batch 3:
    // one VERY late event (a day before the stream min, far beyond the
    // 10-minute delay) — now dropped; batch 4: final flush. Streaming
    // output must equal the batch plan WITHOUT the late event.
    val dir = Events.newReplayDir()
    val now = System.currentTimeMillis()
    Events.writeReplayFile(rawEvents, dir, "ev_all", now - 600000L)
    Events.writeReplayFile(Events.sentinelDf(spark, 0), dir, "zz_00", now - 500000L)
    val veryOldTs = rawEvents.agg(min("ts")).head()
      .getAs[java.time.LocalDateTime](0).minusDays(1)
    val late = spark.createDataFrame(
      java.util.List.of(Row(99999L, veryOldTs, 77L, "click", 1.0, "{}")),
      Events.rawSchema)
    Events.writeReplayFile(late, dir, "ev_late", now - 400000L)
    Events.writeReplayFile(Events.sentinelDf(spark, 1), dir, "zz_01", now - 300000L)

    val stream = Events.readStream(spark, dir.toString, maxFilesPerTrigger = 1)
      .withWatermark("ts", "10 minutes")
    val streamed = Events.runToTable(spark, Events.tumblingCounts(stream), "append", "late")
      .filter(col("event_type") =!= Events.SentinelType)
    val batchWithoutLate = Events.tumblingCounts(Tables.events(spark, sf))
    assert(collectSorted(streamed) == collectSorted(batchWithoutLate),
      "late event must be dropped by the watermark")
  }

  test("stream-stream interval join across micro-batches equals the batch join") {
    // Cross-batch matches are the risk: a purchase in batch N must still
    // find views from batch N-1 (join state retained until the
    // watermark passes v_ts + 1h, derived from the range condition).
    val dir = splitReplay(parts = 3, sentinels = 0)
    val ev = Events.readStream(spark, dir, maxFilesPerTrigger = 1)
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
    val streamed = Events.runToTable(spark, joined, "append", "eqj")

    val bev = Tables.events(spark, sf)
    val bp = bev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    val bv = bev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
    val batch = bp.join(bv,
      col("p_user") === col("v_user") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("v_ts") <= col("p_ts"))
    assert(collectSorted(streamed) == collectSorted(batch))
  }

  test("dropDuplicatesWithinWatermark evicts key state; dropDuplicates never does") {
    // Timeline (minutes from base): the key (user 7, click) first
    // appears at t=0; batch 1 also carries a t=180 row so the watermark
    // jumps far past 0+10min; batch 2 rolls it forward one more batch
    // (eviction uses the watermark computed from the PREVIOUS batch);
    // batch 3 re-sends the key at a fresh, non-late event time. The
    // TTL variant has evicted the key by then and emits it AGAIN —
    // bounded state, second emission. Unbounded dropDuplicates
    // remembers forever and suppresses it.
    val base = java.time.LocalDateTime.ofEpochSecond(1700000000L, 0, java.time.ZoneOffset.UTC)
    def row(id: Long, offMin: Long, user: Long, typ: String) =
      Row(java.lang.Long.valueOf(id), base.plusMinutes(offMin),
        java.lang.Long.valueOf(user), typ, java.lang.Double.valueOf(1.0), "{}")
    def replay(): String = {
      val dir = Events.newReplayDir()
      val now = System.currentTimeMillis()
      def df(rows: Row*) =
        spark.createDataFrame(java.util.Arrays.asList(rows: _*), Events.rawSchema)
      Events.writeReplayFile(df(row(1, 0, 7, "click"), row(2, 180, 8, "view")),
        dir, "b1", now - 600000)
      Events.writeReplayFile(df(row(3, 181, 9, "view")), dir, "b2", now - 500000)
      Events.writeReplayFile(df(row(4, 182, 7, "click")), dir, "b3", now - 400000)
      dir.toString
    }
    val ttl = Events.readStream(spark, replay(), maxFilesPerTrigger = 1)
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
    val ttlOut = Events.runToTable(spark, ttl, "append", "ttl1")
    assert(ttlOut.filter(col("user_id") === 7).count() == 2,
      "evicted key must re-emit after the watermark passes its TTL")

    val forever = Events.readStream(spark, replay(), maxFilesPerTrigger = 1)
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("user_id", "event_type")
    val fOut = Events.runToTable(spark, forever, "append", "ttl2")
    assert(fOut.filter(col("user_id") === 7).count() == 1,
      "unbounded dedup suppresses the re-sent key")
  }

  test("outer-join null emission is watermark-driven: held until flush, then exact") {
    // The same left-outer interval join run twice. Without sentinels
    // the watermark only reaches fixture-max − delay (one no-data
    // micro-batch), so unmatched purchases near the end of the stream
    // are still HELD in join state when input ends — the result is
    // incomplete. With sentinels the watermark passes every row's
    // eviction bound and the nulls equal the batch left join exactly.
    // This is the timing semantics st14's driver entry relies on.
    def run(sentinels: Int, tag: String) = {
      val dir = splitReplay(parts = 1, sentinels = sentinels)
      val ev = Events.readStream(spark, dir)
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
      Events.runToTable(spark, joined, "append", tag).filter(col("p_user") >= 0)
    }
    val unflushedNulls = run(sentinels = 0, "ojn").filter(col("v_user").isNull).count()
    val flushed = run(sentinels = 2, "ojf")
    val nulls = flushed.filter(col("v_user").isNull).count()
    val batch = {
      val bev = Tables.events(spark, sf)
      val bp = bev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      val bv = bev.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
      bp.join(bv, col("p_user") === col("v_user") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("v_ts") <= col("p_ts"), "left_outer")
    }
    assert(nulls > 0, "fixture must contain view-less purchases")
    assert(unflushedNulls < nulls,
      s"tail-window unmatched rows must stay held until the watermark passes " +
        s"them ($unflushedNulls vs $nulls)")
    assert(nulls == batch.filter(col("v_user").isNull).count(),
      "flushed null rows must equal the batch left join's")
    assert(flushed.count() == batch.count())
  }

  test("chained stateful aggs emit a day only when the watermark clears BOTH levels") {
    // st18's distinctive semantics: the day-level re-aggregation can
    // only finalize once the watermark passes the END OF THE DAY —
    // propagated through the hour-level state store beneath it.
    // Without sentinels the watermark stops at fixture-max − delay, so
    // the trailing day (at least) is HELD in level-two state when input
    // ends; with sentinels every day flushes and the result equals the
    // batch recompute of the same two-level plan exactly.
    def run(sentinels: Int, tag: String) = {
      val dir = splitReplay(parts = 3, sentinels = sentinels)
      val ev = Events.readStream(spark, dir, maxFilesPerTrigger = 1)
        .withWatermark("ts", "10 minutes")
      Events.runToTable(spark, Events.chainedDailyStats(ev), "append", tag)
        .filter(col("event_type") =!= Events.SentinelType)
    }
    val held = run(sentinels = 0, "ch0")
    val flushed = run(sentinels = 2, "ch2")
    val batch = Events.chainedDailyStats(Tables.events(spark, sf))
    assert(held.count() < flushed.count(),
      "the trailing day must stay held in level-two state without a flush")
    assert(collectSorted(flushed) == collectSorted(batch),
      "flushed chained aggregation must equal the batch two-level rollup")
  }

  test("stateful dedup emits each key once across micro-batches") {
    val dir = splitReplay(parts = 3, sentinels = 0)
    val stream = Events.readStream(spark, dir, maxFilesPerTrigger = 1)
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("user_id", "event_type")
    val streamed = Events.runToTable(spark, stream, "append", "eqd")
    val distinctPairs = Tables.events(spark, sf)
      .select("user_id", "event_type").distinct().count()
    assert(streamed.count() == distinctPairs)
    assert(streamed.select("user_id", "event_type").distinct().count() == distinctPairs)
  }

  test("st30 streamed index maintenance: no retrain, delta-only refresh, full-assign law") {
    // drive the GATE itself: two corpus waves stream in, each lands a
    // versioned append and re-ensures the committed IVF index
    val out = graft.operators.StreamingQueries
      .queries("st30_stream_ann_maintain")(spark, TestSpark.sf)
      .collect()
    val emb = Tables.embeddings(spark, TestSpark.sf)
    assert(out.length == emb.count(),
      "final index covers exactly the streamed corpus")
    // version pins: the corpus advanced once per wave, the centroids
    // trained once and NEVER retrained, the second wave landed as one
    // delta commit on the assignments
    assert(out.forall(r => r.getLong(2) == 1L), "cent_v must stay 1")
    assert(out.forall(r => r.getLong(3) == 2L), "asg_v = bootstrap + one delta")
    assert(out.forall(r => r.getLong(4) == 2L), "corpus_v = two appends")
    // the incremental ≡ full-assign law through the streaming door:
    // wave-1 training is deterministic ((min+max+1)/2 split +
    // deterministic centroids, doubles round-trip parquet exactly), so
    // the spec re-derives the frozen centroids independently and the
    // streamed index must equal one full assign over the final corpus
    val pairs = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pairs.size == emb.count())
    import graft.vector.Ivf
    val mm = emb.agg(min("vec_id"), max("vec_id")).head()
    val cut = (mm.getLong(0) + mm.getLong(1) + 1L) / 2L
    val cents = Ivf.centroids(emb.filter(col("vec_id") < cut)
      .select("vec_id", "embedding"), "vec_id", "embedding", 16)
    val full = Ivf.assign(emb, "vec_id", "embedding", cents)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pairs == full,
      "streamed incremental maintenance must equal a full assign over " +
        "the final corpus on the wave-1-frozen centroids")
  }
}
