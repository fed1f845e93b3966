package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins for [[VersionedScan]] / [[VersionedFileIndex]]: Catalyst data
  * filters prune manifest files at execution time (the Delta
  * TahoeFileIndex behavior), the manifest byte-sum drives
  * auto-broadcast, and the logical read stays exact under deletion
  * vectors and column mapping. */
class VersionedScanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), tag).toString

  /** 1..100 range-partitioned on k into 4 files with footer stats. */
  private def keyedTable(tag: String): String = {
    val t = tmp(tag)
    Versioned.commit(spark, t,
      (1L to 100L).map(k => (k, s"v$k")).toDF("k", "v"), Some("k"), 4)
    t
  }

  /** The executed scan over the VERSIONED index (through AQE stages —
    * QueryStageExec nodes are leaves to `collect`, so descend into
    * their plans explicitly), post-collect. A DV anti-join adds a
    * second FileScan (the DV parquet); select by FileIndex type. */
  private def scanOf(df: DataFrame): FileSourceScanExec = {
    def walk(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[FileSourceScanExec] = p.collect {
      case s: FileSourceScanExec => Seq(s)
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        walk(q.plan)
    }.flatten
    walk(df.queryExecution.executedPlan)
      .find(_.relation.location.isInstanceOf[VersionedFileIndex])
      .getOrElse(fail(s"no VersionedFileIndex scan in:\n${df.queryExecution.executedPlan}"))
  }

  private def filesRead(df: DataFrame): Long = {
    df.collect()
    scanOf(df).metrics("numFiles").value
  }

  test("unfiltered scan reads every manifest file and matches Versioned.read") {
    val t = keyedTable("vs_all")
    val df = VersionedScan.read(spark, t)
    assert(filesRead(df) == 4L)
    assert(df.orderBy("k").collect().toSeq ==
      Versioned.read(spark, t).orderBy("k").collect().toSeq)
  }

  test("a plain df.filter range predicate skips non-overlapping files in-plan") {
    val t = keyedTable("vs_rng")
    val df = VersionedScan.read(spark, t).filter(col("k") <= 5)
    assert(df.count() == 5)
    assert(filesRead(df) <= 2L,
      "range-partitioned layout: k<=5 lives in the first file (+1 boundary slack)")
    val eq = VersionedScan.read(spark, t).filter(col("k") === 97)
    assert(eq.count() == 1)
    assert(filesRead(eq) <= 2L, "equality prunes to the covering file")
  }

  test("IsNull on an all-non-null column prunes every file; result stays exact") {
    val t = keyedTable("vs_null")
    val df = VersionedScan.read(spark, t).filter(col("v").isNull)
    assert(df.count() == 0)
    assert(filesRead(df) == 0L, "null-count stats admit no file")
  }

  test("bloom index narrows string equality beyond min/max overlap") {
    val t = tmp("vs_bloom")
    // interleave so every file's string [min,max] overlaps the probe
    val rows = (1L to 100L).map(k => (k, s"doc${k % 10}_${k}"))
    Versioned.commit(spark, t, rows.toDF("k", "v"), Some("k"), 4)
    Versioned.addBloomIndex(spark, t, "v")
    val df = VersionedScan.read(spark, t).filter(col("v") === "doc2_42")
    assert(df.count() == 1)
    assert(filesRead(df) <= 2L,
      "bloom bitsets exclude files min/max cannot (≤1 expected + FP slack)")
  }

  test("manifest sizeInBytes auto-broadcasts a small versioned dimension") {
    val t = keyedTable("vs_bcast")
    val fact = spark.range(0, 1000).select(
      (col("id") % 100 + 1).as("k"), col("id").as("x"))
    val joined = fact.join(VersionedScan.read(spark, t), "k")
    joined.collect()
    val plan = joined.queryExecution.executedPlan
    val fin = plan.collectFirst { case a: AdaptiveSparkPlanExec => a }
      .map(_.executedPlan.toString).getOrElse(plan.toString)
    assert(fin.contains("BroadcastHashJoin"),
      s"manifest byte stats should make the dim auto-broadcast:\n$fin")
  }

  test("z-ordered layout + per-column stats prune BOTH dimensions in-plan") {
    val t = tmp("vs_zo")
    // two independent dims, 32x32 grid — a 1-D sort would leave the
    // second dim's per-file ranges spanning the whole domain
    val rows = for (a <- 1L to 32L; b <- 1L to 32L) yield (a, b, a * 1000 + b)
    Versioned.commit(spark, t, rows.toDF("a", "b", "x"), Some("a"), 4)
    Versioned.zorderCommit(spark, t, "a", "b", files = 16)
    val onA = VersionedScan.read(spark, t).filter(col("a") <= 4)
    assert(onA.count() == 4 * 32)
    val fa = filesRead(onA)
    val onB = VersionedScan.read(spark, t).filter(col("b") <= 4)
    assert(onB.count() == 4 * 32)
    val fb = filesRead(onB)
    assert(fa < 16 && fb < 16,
      s"both dims must prune under the z-order layout (a:$fa b:$fb of 16)")
  }

  test("exact under deletion vectors + column mapping; pruning still bites") {
    val t = keyedTable("vs_dvmap")
    Versioned.deleteMergeOnRead(spark, t, Seq(3L, 98L).toDF("k"), "k")
    Versioned.renameColumn(spark, t, "k", "id")
    val all = VersionedScan.read(spark, t)
    assert(all.count() == 98)
    assert(all.orderBy("id").collect().toSeq ==
      Versioned.read(spark, t).orderBy("id").collect().toSeq,
      "VersionedScan ≡ Versioned.read under DV + rename")
    val pruned = VersionedScan.read(spark, t).filter(col("id") <= 5)
    assert(pruned.count() == 4, "k=3 deleted")
    assert(filesRead(pruned) <= 2L,
      "filter on the RENAMED logical column pushes through the alias and prunes")
  }
}
