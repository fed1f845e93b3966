package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.file.attribute.FileTime

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` stream (SURVEY.md §2-B
  * "Streaming"): watermarked tumbling/sliding windows, session windows,
  * and stateful dedup.
  *
  * Design rule: every transformation here is a plain
  * `DataFrame => DataFrame` applied IDENTICALLY to a batch read and a
  * `readStream` — batch/streaming equivalence is a property of the same
  * code path, not of two parallel implementations. The batch-equivalence
  * tests (StreamingSpec) and the driver-facing streaming queries
  * ([[graft.operators.StreamingQueries]]) both lean on this.
  *
  * Execution harness: the fixture parquet is replayed as a FILE STREAM
  * (`maxFilesPerTrigger` controls micro-batch granularity). For
  * append-mode event-time aggregations, final windows only emit once the
  * watermark passes them — end-of-input does NOT flush state — so the
  * replay directory appends far-future SENTINEL files (user_id = -1,
  * event_type = "__sentinel") whose only job is to advance the watermark
  * in trailing micro-batches; sentinel-derived rows are filtered from
  * results. This mirrors the production "heartbeat/flush event" pattern
  * for finite replays of unbounded pipelines.
  */
object Events {

  val SentinelType = "__sentinel"

  /** Physical schema of events.parquet: `ts` is parquet
    * TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark surfaces as
    * TIMESTAMP_NTZ — see [[graft.sources.Tables.events]]. */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** NTZ → session-zoned timestamps (the session is pinned to UTC, so
    * this is the same instant; the batch reader applies the identical
    * cast, so batch and stream agree exactly — and event-time
    * watermarks/windows run on plain TimestampType everywhere). */
  def normalize(df: DataFrame): DataFrame =
    df.withColumn("ts", col("ts").cast(TimestampType))

  /** Conf-isolated session for a streaming run. Stateful operators fix
    * their state-partition count from `spark.sql.shuffle.partitions` at
    * first checkpoint, and every micro-batch commits one state-store
    * delta PER PARTITION PER STATEFUL OP — for a finite replay that
    * overhead dwarfs the data unless partitions are sized to the
    * replay's keyspace. `newSession()` shares the SparkContext but owns
    * its conf, so tuning here never leaks into the batch engine
    * (readers must not mutate shared session conf). At production scale
    * the same knob is sized to throughput, not defaulted.
    *
    * Default 1 for the replay gates: a stream-stream join carries FOUR
    * state stores per side-pair, so at 8 partitions a 4-batch replay
    * commits 100+ store deltas for ~100k rows — measured ~1.7 s of
    * pure per-partition overhead per join gate (st19: 5.3 s at 8 →
    * 3.6 s at 2, identical results; state partitioning is internal
    * hashing, never semantics). The r11 floor profile
    * (StreamFloorProbe) showed the residual per-batch cost is
    * addBatch-dominated with per-partition state commits still the
    * biggest tunable slice — 2 → 1 cut the st1-shape steady-state
    * pass another ~25% (2.89 → 2.17 s) with identical results, and a
    * replay's ~100k rows are far below any single-task ceiling. */
  def streamingSession(spark: SparkSession, statePartitions: Int = 1): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    // the one-sentinel replay contract DEPENDS on the trailing no-data
    // micro-batch performing the final watermark flush hop — pin the
    // conf (it is Spark's default, but a deployment override would
    // silently drop every gate's final windows)
    s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    s
  }

  /** File-stream read of an events directory. */
  def readStream(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 0): DataFrame = {
    val base = spark.readStream.schema(rawSchema)
    val withOpt =
      if (maxFilesPerTrigger > 0) base.option("maxFilesPerTrigger", maxFilesPerTrigger)
      else base
    normalize(withOpt.parquet(dir))
  }

  // ------------------------------------------------------------------
  // Transformations — shared verbatim by batch and streaming plans.
  // ------------------------------------------------------------------

  /** Tumbling 1-hour window counts + value sums per event type (the
    * streaming form of q25). */
  def tumblingCounts(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("cnt"), col("sum_value"))

  /** Sliding 1-hour window (30-minute slide) counts per event type —
    * every event lands in exactly two windows. */
  def slidingCounts(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("cnt"))

  /** CHAINED stateful aggregation — two windowed aggregations in ONE
    * streaming query (Spark 4 multiple-stateful-operator support):
    * tumbling 1-hour counts per type, re-aggregated into per-day
    * max/total/hour-count. The second groupBy windows over the FIRST
    * window's struct (`window(col("window"), "1 day")`), which is what
    * lets the engine chain watermark propagation through both state
    * stores; results emit in append mode once the watermark clears the
    * DAY, so the late-arrival contract composes across both levels.
    * At scale this replaces the land-hourly-then-batch-rollup two-job
    * pattern with one pipeline and no intermediate sink. */
  def chainedDailyStats(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(window(col("window"), "1 day"), col("event_type"))
      .agg(max("cnt").as("max_hourly"), sum("cnt").cast("long").as("total"),
        count(lit(1)).as("n_hours"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("max_hourly"), col("total"), col("n_hours"))

  /** Gap-based sessionization via `session_window` (30-minute gap).
    * Session end = last event + gap (Spark semantics; the DuckDB oracle
    * mirrors it, including the >=-gap-starts-new-session boundary). */
  def sessionAgg(ev: DataFrame): DataFrame =
    ev.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("cnt"))

  // ------------------------------------------------------------------
  // Execution harness.
  // ------------------------------------------------------------------

  /** Run a (finite) streaming plan to completion with
    * `Trigger.AvailableNow` into a memory sink; returns the sink table.
    * Checkpoints under target/stream (inside the repo). */
  def runToTable(spark: SparkSession, stream: DataFrame, mode: String, tag: String): DataFrame = {
    val name = tag + "_" + java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val ckpt = Files.createDirectories(Paths.get("target", "stream", "ckpt_" + name))
    val q = stream.writeStream
      .format("memory").queryName(name)
      .outputMode(mode)
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** Fresh replay directory under target/stream. */
  def newReplayDir(): java.nio.file.Path =
    Files.createDirectories(
      Paths.get("target", "stream",
        "replay_" + java.util.UUID.randomUUID().toString.replace("-", "").take(12)))

  /** Memoized DETERMINISTIC replay-source directory, keyed (sf dir,
    * tag): the build runs once per JVM and the directory is consumed
    * strictly READ-ONLY from then on — the [[replayDir]] /
    * MinhashSource pattern generalized, so every gate whose source
    * fixture is a pure function of the sf dir stops re-paying the
    * band/split writes on every bench rep (they are fixture prep, not
    * the measured operator). Mutable per-run state — checkpoints,
    * sink tables, index roots — must live OUTSIDE the returned dir
    * (a reused checkpoint would silently skip the replay, turning the
    * gate into a no-op; callers allocate a fresh [[newReplayDir]] for
    * that). */
  def memoSource(tag: String, sfDir: String)(
      build: java.nio.file.Path => Unit): String =
    sourceDirs.computeIfAbsent((sfDir, tag), _ => {
      val dir = newReplayDir()
      build(dir)
      dir.toString
    })

  private val sourceDirs =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  /** Write `df` as a single parquet file `<name>.parquet` in `dir` with
    * the given modification time — the file source processes files in
    * mtime order (latestFirst=false), so mtimes define batch order under
    * `maxFilesPerTrigger=1`. Building block for replays and tests. */
  def writeReplayFile(
      df: DataFrame, dir: java.nio.file.Path, name: String, mtimeMs: Long): Unit = {
    val staging = dir.resolve(s"__staging_$name")
    df.coalesce(1).write.mode("overwrite").parquet(staging.toString)
    val part = Files.list(staging).filter(_.toString.endsWith(".parquet")).findFirst().get()
    val dst = dir.resolve(s"$name.parquet")
    Files.move(part, dst, StandardCopyOption.REPLACE_EXISTING)
    Files.setLastModifiedTime(dst, FileTime.fromMillis(mtimeMs))
    Files.walk(staging).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => Files.deleteIfExists(p))
  }

  /** Split `df` into `parts` time-ordered replay files in ONE
    * distributed write: `repartitionByRange` on the order columns makes
    * each part file a contiguous time band (part-00000 = earliest), and
    * mtimes replay them in band order. Replaces the global-window
    * (`ntile`) banding — no single-partition funnel anywhere in fixture
    * prep, so the same helper would band a 100× fixture. */
  def writeReplayBands(df: DataFrame, dir: java.nio.file.Path, parts: Int,
      baseMtimeMs: Long, tag: String,
      orderCols: Seq[String] = Seq("ts", "event_id")): Unit = {
    val staging = dir.resolve(s"__staging_bands_$tag")
    df.repartitionByRange(parts, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.head, orderCols.tail: _*)
      .write.mode("overwrite").parquet(staging.toString)
    val bands = Files.list(staging)
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .sorted().iterator().asScala.toSeq
    bands.zipWithIndex.foreach { case (part, i) =>
      val dst = dir.resolve(f"${tag}_$i%02d.parquet")
      Files.move(part, dst, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dst, FileTime.fromMillis(baseMtimeMs + i * 60000L))
    }
    Files.walk(staging).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => Files.deleteIfExists(p))
  }

  /** One-row far-future flush DataFrame (see object doc); `i` staggers
    * the timestamp so successive sentinels keep advancing the watermark. */
  def sentinelDf(spark: SparkSession, i: Int): DataFrame = {
    // 2100-01-01T00:00:00 — far past any fixture event.
    val farFuture = java.time.LocalDateTime.of(2100, 1, 1, 0, 0).plusDays(i.toLong)
    spark.createDataFrame(
      java.util.List.of(
        org.apache.spark.sql.Row(
          -1L - i, farFuture, -1L, SentinelType, 0.0, "{}")),
      rawSchema)
  }

  /** Build a replay directory: the sf events parquet (earliest mtime)
    * plus `sentinels` flush files with increasing timestamps and mtimes,
    * so a `maxFilesPerTrigger=1` AvailableNow run processes real data
    * first and then advances the watermark. */
  def replayDir(spark: SparkSession, sfDir: String, sentinels: Int): String =
    replayDirs.computeIfAbsent((sfDir, sentinels),
      _ => buildReplayDir(spark, sfDir, sentinels))

  /** Replay directories are DETERMINISTIC per (sf dir, sentinel count)
    * and consumed strictly read-only (each stream's checkpoint — the
    * only mutable state — is per-run), so one build serves every gate
    * and every bench rep in the JVM: the sentinel writes are Spark
    * jobs costing ~1–3 s each run, which was pure fixture overhead
    * re-paid per gate per pass. computeIfAbsent keeps the build
    * atomic per key under concurrent callers. */
  private val replayDirs =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), String]()

  private def buildReplayDir(spark: SparkSession, sfDir: String,
      sentinels: Int): String = {
    val dir = newReplayDir()
    val events = Paths.get(sfDir, "events.parquet")
    val dst = dir.resolve("aa_events.parquet")
    Files.copy(events, dst, StandardCopyOption.REPLACE_EXISTING)
    val now = System.currentTimeMillis()
    Files.setLastModifiedTime(dst, FileTime.fromMillis(now - 600000L))
    (0 until sentinels).foreach { i =>
      writeReplayFile(sentinelDf(spark, i), dir, f"zz_sentinel_$i%02d",
        now - 300000L + i * 60000L)
    }
    dir.toString
  }
}
