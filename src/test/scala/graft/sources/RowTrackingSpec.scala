package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Row-tracking pins ([[Versioned.readWithRowIds]]): `_row_id` =
  * manifest baseRowId + in-file position — unique and dense on a fresh
  * lineage, STABLE across carry-by-reference commits (appends, DDL,
  * deletion vectors), reassigned only by rewrites, with the high-water
  * mark monotone so rewritten files can never collide with carried
  * ones. */
class RowTrackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), tag).toString

  private def ids(t: String, version: Long = -1L): Map[Long, Long] =
    Versioned.readWithRowIds(spark, t, version)
      .select(col("k"), col("_row_id"))
      .as[(Long, Long)].collect().toMap

  test("fresh lineage: ids unique and dense; appends extend densely") {
    val t = tmp("rt_dense")
    Versioned.commit(spark, t,
      (1L to 10L).map(k => (k, s"v$k")).toDF("k", "v"), Some("k"), 3)
    val v1 = ids(t)
    assert(v1.values.toSet == (0L until 10L).toSet,
      "first commit assigns exactly [0, rows)")
    Versioned.appendCommit(spark, t,
      (11L to 15L).map(k => (k, s"v$k")).toDF("k", "v"), Some("k"), 2)
    val v2 = ids(t)
    assert(v2.values.toSet == (0L until 15L).toSet,
      "append extends the id space densely from the high-water mark")
    assert(v1.forall { case (k, id) => v2(k) == id },
      "every v1 row keeps its id across the append")
  }

  test("ids survive metadata DDL and deletion-vector deletes; deleted ids vanish") {
    val t = tmp("rt_stable")
    Versioned.commit(spark, t,
      (1L to 12L).map(k => (k, s"v$k")).toDF("k", "v"), Some("k"), 3)
    val before = ids(t)
    Versioned.addCheckConstraint(spark, t, "k_pos", "k > 0") // metadata-only
    Versioned.deleteMergeOnRead(spark, t, Seq(3L, 7L).toDF("k"), "k") // DV
    val after = ids(t)
    assert(!after.contains(3L) && !after.contains(7L),
      "tombstoned rows are gone from the row-id read")
    assert(after.forall { case (k, id) => before(k) == id },
      "surviving rows keep their ids through DDL + DV commits")
  }

  test("rewrites reassign from a monotone mark — no collision with carried files") {
    val t = tmp("rt_rewrite")
    Versioned.commit(spark, t,
      (1L to 20L).map(k => (k, s"v$k")).toDF("k", "v"), Some("k"), 4)
    // keyed delete rewrites only the files whose range intersects the
    // tombstones; untouched files carry with their original base
    Versioned.deleteWhereKeyIn(spark, t, Seq(2L, 4L).toDF("k"), "k")
    val after = ids(t)
    assert(after.size == 18)
    assert(after.values.toSet.size == 18,
      "rewritten rows' fresh ids never collide with carried files' ids")
    val snap = Versioned.snapshot(spark, t)
    assert(snap.rowHwm.exists(_ >= 20L),
      "high-water mark never regresses below ids ever assigned")
    assert(snap.files.forall(_.baseRowId.isDefined))
  }

  test("_row_commit reports the version that introduced each row's file, " +
      "stable through metadata commits") {
    val t = tmp("rt_commitver")
    Versioned.commit(spark, t,
      (1L to 6L).map(k => (k, s"v$k")).toDF("k", "v"), Some("k"), 2)
    Versioned.appendCommit(spark, t,
      (7L to 9L).map(k => (k, s"v$k")).toDF("k", "v"), Some("k"), 1)
    Versioned.addCheckConstraint(spark, t, "k_pos", "k > 0") // v3, metadata
    val rows = Versioned.readWithRowIds(spark, t, withCommitVersion = true)
      .select(col("k"), col("_row_commit"))
      .as[(Long, Long)].collect().toMap
    assert((1L to 6L).forall(rows(_) == 1L),
      "v1 rows report version 1 through the later commits")
    assert((7L to 9L).forall(rows(_) == 2L),
      "appended rows report the append's version")
  }

  test("readWithRowIds refuses a file that predates row tracking") {
    val t = tmp("rt_legacy")
    Versioned.commit(spark, t,
      (1L to 4L).map(k => (k, s"v$k")).toDF("k", "v"), Some("k"), 1)
    // simulate a pre-row-tracking manifest: strip bri from the segment
    val dir = new org.apache.hadoop.fs.Path(t, "_versions")
    val f = Versioned.fs(spark, t)
    val seg = f.listStatus(dir).map(_.getPath)
      .filter(_.getName.startsWith("seg_")).head
    val in = f.open(seg)
    val txt = try new String(
      org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
    finally in.close()
    f.delete(seg, false)
    val out = f.create(seg, true)
    try out.write(txt.replaceAll("\"bri\"\\s*:\\s*\\d+,?", "").getBytes("UTF-8"))
    finally out.close()
    Versioned.clearSegmentCache()
    val e = intercept[IllegalArgumentException](
      Versioned.readWithRowIds(spark, t))
    assert(e.getMessage.contains("predates row tracking"))
  }
}
