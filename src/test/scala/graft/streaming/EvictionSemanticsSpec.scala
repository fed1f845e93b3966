package graft.streaming

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the exact eviction algebra of `dropDuplicatesWithinWatermark`
  * that st13's DuckDB oracle replays — established empirically here,
  * because the scale contract depends on it:
  *
  *  - A duplicate in batch i sees its key's state ABSENT iff the stored
  *    expiry (first-emission time + delay) is below the LATE-EVENTS
  *    watermark — which lags one batch behind the eviction watermark.
  *    Effectively: evicted entering batch i ⇔
  *    `t_emit + 2·delay < max_ts(batches ≤ i−2)`.
  *  - Duplicates dropped while state is live do NOT extend the expiry
  *    (dedup is anchored to the FIRST occurrence).
  *
  * The four keys below produce a different emission fingerprint under
  * each rival model (current-watermark eviction, expiry extension, or
  * both), so a Spark behavior change flips this test before it can
  * silently flip st13's driver row.
  */
class EvictionSemanticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("TTL dedup: late-events-watermark eviction, no expiry extension") {
    val base = java.time.LocalDateTime.ofEpochSecond(1700000000L, 0, java.time.ZoneOffset.UTC)
    def row(id: Long, offMin: Long, user: Long) =
      Row(java.lang.Long.valueOf(id), base.plusMinutes(offMin),
        java.lang.Long.valueOf(user), "click", java.lang.Double.valueOf(1.0), "{}")
    val dir = Events.newReplayDir()
    val now = System.currentTimeMillis()
    def df(rows: Row*) =
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), Events.rawSchema)
    // delay = 10 min. Batch maxes: m1 = 30, m2 = 48 (fillers 81/82).
    // K1@0 then dups at 31/61; K2@25 then 32/62; K3 new at 33, dup 63;
    // K4@1 then dup at 34 only.
    Events.writeReplayFile(df(row(1, 0, 1), row(2, 25, 2), row(3, 1, 4), row(4, 30, 81)),
      dir, "b1", now - 600000)
    Events.writeReplayFile(df(row(5, 31, 1), row(6, 32, 2), row(7, 33, 3),
      row(8, 34, 4), row(9, 48, 82)), dir, "b2", now - 500000)
    Events.writeReplayFile(df(row(10, 61, 1), row(11, 62, 2), row(12, 63, 3)),
      dir, "b3", now - 400000)
    val out = Events.runToTable(spark,
      Events.readStream(spark, dir.toString, maxFilesPerTrigger = 1)
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark("user_id", "event_type"),
      "append", "evsem")
    val counts = out.filter(col("user_id") < 80).groupBy("user_id")
      .count().orderBy("user_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // K1: batch-2 dup survives (nothing evicts entering batch 2 — the
    //     late-events watermark is still unset), batch-3 dup re-emits
    //     (0 + 20 min < m1=30). 2 emissions under every model — the
    //     baseline that eviction fires at all.
    // K2: 25 + 20 min >= m1 → state live entering batch 3 → 1 emission.
    //     Under current-watermark eviction K2 would re-emit in batch 3
    //     (expiry 35 < m2−10=38) → 2.
    // K4: 1 emission; would re-emit in batch 2 under current-watermark
    //     eviction (expiry 11 < m1−10=20) → 2.
    // K3: new in batch 2, dup at 63 while live → always 1.
    assert(counts == Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 1L),
      s"eviction fingerprint changed: $counts")
  }
}
