package graft.sources

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins for the `format("graft")` front door: SaveMode drives the
  * commit protocol, the read relation round-trips (with time travel and
  * pushed filters), and the streaming sink appends each micro-batch
  * exactly once (txn-idempotent replay). */
class GraftSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), tag).toString

  test("SaveMode maps onto the commit protocol; read door round-trips") {
    val t = tmp("gsrc_modes")
    val d1 = (1L to 10L).map(i => (i, s"v$i")).toDF("id", "v")
    d1.write.format("graft").option("key", "id").save(t) // create
    assert(Versioned.latestVersion(spark, t) == 1L)
    (11L to 15L).map(i => (i, s"v$i")).toDF("id", "v")
      .write.format("graft").mode(SaveMode.Append).save(t)
    assert(spark.read.format("graft").load(t).count() == 15)
    // time travel through the reader option
    assert(spark.read.format("graft").option("versionAsOf", "1")
      .load(t).count() == 10)
    // Ignore: table exists → no new version
    d1.write.format("graft").mode(SaveMode.Ignore).save(t)
    assert(Versioned.latestVersion(spark, t) == 2L)
    // ErrorIfExists: refuses
    intercept[IllegalStateException] {
      d1.write.format("graft").mode(SaveMode.ErrorIfExists).save(t)
    }
    // Overwrite: full commit, rows replaced
    (1L to 5L).map(i => (i, "w")).toDF("id", "v")
      .write.format("graft").mode(SaveMode.Overwrite).save(t)
    assert(spark.read.format("graft").load(t).count() == 5)
    assert(Versioned.latestVersion(spark, t) == 3L)
  }

  test("pushed filters and column pruning return exact results") {
    val t = tmp("gsrc_push")
    (1L to 100L).map(i => (i, i % 7, s"row$i")).toDF("id", "grp", "v")
      .write.format("graft").option("key", "id").option("files", "4").save(t)
    val df = spark.read.format("graft").load(t)
    // key-range filter (the file-skipping shape) and a non-key filter
    assert(df.filter(col("id") <= 10).count() == 10)
    assert(df.filter(col("grp") === 3 && col("id") > 50).count() == 7)
    // projection-only read
    assert(df.select("v").where(col("v") === "row42").count() == 1)
    // aggregate with empty required columns (count star)
    assert(df.groupBy().count().head().getLong(0) == 100)
  }

  test("read door sees deletion vectors and column mapping") {
    val t = tmp("gsrc_dv")
    Versioned.commit(spark,
      t, (1L to 20L).map(i => (i, s"n$i")).toDF("id", "name"), Some("id"), 2)
    Versioned.deleteMergeOnRead(spark, t,
      Seq(3L, 7L).toDF("id"), "id")
    Versioned.renameColumn(spark, t, "name", "label")
    val df = spark.read.format("graft").load(t)
    assert(df.columns.toSeq == Seq("id", "label"))
    assert(df.count() == 18)
    assert(df.filter(col("id") === 3).isEmpty)
  }

  test("streaming sink replay of the same batchId is a no-op (txn)") {
    val t = tmp("gsrc_txn")
    val sink = new GraftSink(t, Some("id"), 2)
    val batch = (1L to 5L).map(i => (i, i * 2)).toDF("id", "x")
    sink.addBatch(0L, batch)
    val v1 = Versioned.latestVersion(spark, t)
    sink.addBatch(0L, batch) // at-least-once replay after a crash
    assert(Versioned.latestVersion(spark, t) == v1,
      "replayed batch must not commit twice")
    assert(Versioned.read(spark, t).count() == 5)
    sink.addBatch(1L, batch.withColumn("id", col("id") + 10))
    assert(Versioned.read(spark, t).count() == 10)
  }

  test("readChangeFeed door: creation-inclusive startingVersion, Delta " +
      "semantics; later starts match changes()") {
    val t = tmp("gsrc_cdf")
    Versioned.commit(spark, t,
      (1L to 10L).map(k => (k, k * 2)).toDF("k", "x"), Some("k"), 2)
    Versioned.mergeCommit(spark, t,
      Seq((1L, 99L), (11L, 22L)).toDF("k", "x"), Seq("k"))
    def cdf(from: Long) = spark.read.format("graft")
      .option("readChangeFeed", "true").option("startingVersion", from)
      .load(t)
    // from 1: v1's ten creation inserts + v2's (update, insert)
    val all = cdf(1).groupBy("version", "change_type").count()
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(all == Set((1L, "insert", 10L), (2L, "insert", 1L),
      (2L, "update", 1L)))
    // from 2: exactly the changes() walk
    val later = cdf(2).select("version", "change_type", "k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(later == Set((2L, "insert", 11L), (2L, "update", 1L)))
    // key override for tables whose identity differs from the commit key
    assert(cdf(1).columns.contains("change_type"))
  }

  test("streaming CDF: creation then per-version events; a rewrite-only " +
      "commit emits NOTHING (no ignoreChanges needed)") {
    val t = tmp("gsrc_scdf")
    val out = tmp("gsrc_scdf_out")
    val ckpt = tmp("gsrc_scdf_ck")
    def drain(): Unit = {
      val q = spark.readStream.format("graft")
        .option("readChangeFeed", "true").load(t)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    Versioned.commit(spark, t,
      (1L to 8L).map(k => (k, k * 10)).toDF("k", "x"), Some("k"), 4)
    drain()
    def events() = spark.read.parquet(out)
      .select("version", "change_type", "k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(events() == (1L to 8L).map(k => (1L, "insert", k)).toSet,
      "first batch = the creation as inserts")
    // a pure rewrite: same logical rows, new files — the appended-files
    // source would demand ignoreChanges; the CDF source emits nothing
    Versioned.compactCommit(spark, t, targetFiles = 1)
    drain()
    assert(events().size == 8, "OPTIMIZE emitted zero change events")
    Versioned.mergeCommit(spark, t, Seq((2L, 99L), (9L, 90L)).toDF("k", "x"),
      Seq("k"))
    drain()
    assert(events() -- (1L to 8L).map(k => (1L, "insert", k)) ==
      Set((3L, "update", 2L), (3L, "insert", 9L)),
      "merge surfaces as keyed update/insert events at its version")
  }

  test("sink autoCompact: trickle batches converge instead of fragmenting; " +
      "txn idempotency survives") {
    val t = tmp("gsrc_autoc")
    val sink = new GraftSink(t, Some("id"), 1,
      autoCompactTarget = Some(256L << 20), minSmallFiles = 4)
    (0 until 6).foreach { b =>
      sink.addBatch(b.toLong,
        (1L to 50L).map(i => (b * 100L + i, i)).toDF("id", "x"))
    }
    assert(Versioned.snapshot(spark, t).files.size == 3,
      "1 packed + 2 sub-trigger batch files")
    assert(Versioned.history(spark, t)
      .filter(col("operation") === "OPTIMIZE").count() == 1)
    assert(Versioned.read(spark, t).count() == 300)
    // replay of the last batch: append skipped by txn; the compaction
    // check re-runs and is a no-op under the trigger
    val v = Versioned.latestVersion(spark, t)
    sink.addBatch(5L, (1L to 50L).map(i => (500L + i, i)).toDF("id", "x"))
    assert(Versioned.latestVersion(spark, t) == v,
      "replayed batch commits nothing — no append, no compaction")
  }

  test("readStream.format(graft): backfill, then version-incremental tail") {
    val src = tmp("gsrc_ssrc")
    val dst = tmp("gsrc_sdst")
    val ckpt = tmp("gsrc_sck")
    def replicate(): Unit = {
      val q = spark.readStream.format("graft").load(src)
        .writeStream.format("graft")
        .option("key", "id").option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start(dst)
      q.awaitTermination(120000)
    }
    Versioned.commit(spark, src,
      (1L to 20L).map(i => (i, s"a$i")).toDF("id", "v"), Some("id"), 2)
    replicate() // backfill batch
    assert(Versioned.read(spark, dst).count() == 20)
    val dstV1 = Versioned.latestVersion(spark, dst)
    Versioned.appendCommit(spark, src,
      (21L to 25L).map(i => (i, s"b$i")).toDF("id", "v"), Some("id"), 1)
    replicate() // incremental batch: ONLY the appended files
    assert(Versioned.read(spark, dst).count() == 25,
      "tail must add exactly the appended rows (no re-emission)")
    assert(Versioned.latestVersion(spark, dst) == dstV1 + 1)
    // no new source version → no new batch, no new dst version
    replicate()
    assert(Versioned.latestVersion(spark, dst) == dstV1 + 1)
  }

  test("timestampAsOf reader option resolves through commit timestamps") {
    val t = tmp("gsrc_ts")
    Versioned.commit(spark, t, (1L to 10L).toDF("id"), Some("id"), 1,
      ts = Some(1000000L))
    Versioned.appendCommit(spark, t, (11L to 20L).toDF("id"), Some("id"), 1,
      ts = Some(2000000L))
    val atV1 = new java.sql.Timestamp(1500000L).toString
    assert(spark.read.format("graft").option("timestampAsOf", atV1)
      .load(t).count() == 10)
    intercept[IllegalArgumentException] {
      spark.read.format("graft").option("timestampAsOf", atV1)
        .option("versionAsOf", "1").load(t).count()
    }
  }

  test("maxVersionsPerTrigger bounds each micro-batch's version range") {
    val src = tmp("gsrc_rate")
    val dst = tmp("gsrc_ratedst")
    val ckpt = tmp("gsrc_rateck")
    Versioned.commit(spark, src, (1L to 4L).toDF("id"), Some("id"), 1)
    (2 to 4).foreach(i => Versioned.appendCommit(spark, src,
      Seq(i.toLong * 10).toDF("id"), Some("id"), 1))
    assert(Versioned.latestVersion(spark, src) == 4L)
    val q = spark.readStream.format("graft")
      .option("maxVersionsPerTrigger", "1").load(src)
      .writeStream.format("graft")
      .option("key", "id").option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start(dst)
    q.awaitTermination(120000)
    // batch 0 backfills v1, then one batch per remaining version → the
    // dst table minted 4 versions and holds every row exactly once
    assert(Versioned.read(spark, dst).count() == 7)
    assert(Versioned.latestVersion(spark, dst) == 4L,
      "rate limit must split the backlog into one batch per version")
  }

  test("readStream.format(graft) refuses a rewrite unless ignoreChanges") {
    val src = tmp("gsrc_rw")
    val ckpt = tmp("gsrc_rwck")
    val dst = tmp("gsrc_rwdst")
    Versioned.commit(spark, src,
      (1L to 10L).map(i => (i, i)).toDF("id", "x"), Some("id"), 2)
    def drain(ignoreChanges: Boolean): Long = {
      val rd = spark.readStream.format("graft")
        .option("ignoreChanges", ignoreChanges.toString).load(src)
      val q = rd.writeStream.format("graft")
        .option("key", "id").option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start(dst)
      q.awaitTermination(120000)
      Versioned.read(spark, dst).count()
    }
    assert(drain(ignoreChanges = false) == 10)
    Versioned.commit(spark, src, // full rewrite: files removed
      (1L to 5L).map(i => (i, i * 2)).toDF("id", "x"), Some("id"), 1)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(ignoreChanges = false)
    }
    assert(Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .take(8).exists(_.getMessage != null) &&
      Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null).take(8)
        .exists(t => Option(t.getMessage).exists(_.contains("ignoreChanges"))),
      s"rewrite must surface the ignoreChanges hint; got: ${e.getMessage}")
    // with ignoreChanges the rewrite's files flow as appends (rewritten
    // rows re-emitted into dst on top of the backfilled 10)
    assert(drain(ignoreChanges = true) == 15)
  }

  test("writeStream.format(graft) ingests a file stream end-to-end") {
    val src = tmp("gsrc_in")
    val t = tmp("gsrc_tbl")
    val ckpt = tmp("gsrc_ckpt")
    (1L to 30L).map(i => (i, s"d$i")).toDF("id", "v")
      .coalesce(3).write.mode("overwrite").json(src)
    val stream = spark.readStream
      .schema("id LONG, v STRING")
      .option("maxFilesPerTrigger", "1")
      .json(src)
    val q = stream.writeStream.format("graft")
      .option("key", "id").option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start(t)
    q.awaitTermination(120000)
    assert(spark.read.format("graft").load(t).count() == 30)
    // multiple micro-batches landed as separate append commits
    assert(Versioned.latestVersion(spark, t) >= 2L)
  }

  test("branch and tag options address forks through the format door") {
    val t = tmp("gsrc_branch")
    (1L to 50L).map(i => (i, i * 2)).toDF("k", "v")
      .write.format("graft").option("key", "k").save(t)
    Branches.tag(spark, t, "r1")
    Branches.create(spark, t, "dev")
    // append lands on the BRANCH, not the parent
    (51L to 60L).map(i => (i, i * 2)).toDF("k", "v")
      .write.format("graft").mode(SaveMode.Append)
      .option("key", "k").option("branch", "dev").save(t)
    assert(spark.read.format("graft").load(t).count() == 50)
    assert(spark.read.format("graft").option("branch", "dev").load(t)
      .count() == 60)
    // tag pins v1 after the parent advances
    (1L to 5L).map(i => (i, i)).toDF("k", "v")
      .write.format("graft").mode(SaveMode.Overwrite).option("key", "k").save(t)
    assert(spark.read.format("graft").option("tag", "r1").load(t).count() == 50)
    // a write to a branch nobody created is refused
    intercept[IllegalArgumentException] {
      (1L to 3L).map(i => (i, i)).toDF("k", "v")
        .write.format("graft").mode(SaveMode.Append)
        .option("branch", "nope").save(t)
    }
  }
}
