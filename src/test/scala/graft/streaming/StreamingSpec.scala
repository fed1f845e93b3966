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
    val veryOldTsNs = rawEvents.agg(min("ts")).head().getLong(0) - 86400000000000L
    val late = spark.createDataFrame(
      java.util.List.of(Row(99999L, veryOldTsNs, 77L, "click", 1.0, "{}")),
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
}
