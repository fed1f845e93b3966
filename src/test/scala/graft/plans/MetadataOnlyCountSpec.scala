package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Versioned

/** Pins for [[MetadataOnlyCount]]: a global count(*) over a versioned
  * scan must collapse to a LocalRelation (no scan node at all), and
  * every disqualifier — a Filter, a deletion vector, null-skipping
  * count(col), DISTINCT — must block the rewrite while staying
  * correct. */
class MetadataOnlyCountSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), tag).toString

  private def rewritten(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectLeaves()
      .forall(_.isInstanceOf[LocalRelation])

  test("plain count(*) collapses to the manifest sum — no scan planned") {
    val t = tmp("mc_plain")
    Versioned.commit(spark, t,
      (1L to 100L).map(k => (k, if (k % 5 == 0) null else s"v$k"))
        .toDF("k", "v"), Some("k"), 4)
    val df = spark.sql(s"SELECT count(*) AS n FROM graft_table('$t')")
    assert(rewritten(df), "optimized plan is a LocalRelation, nothing else")
    assert(df.as[Long].head() == 100L)
    // multiple count literals in one aggregate all fold
    val multi = spark.sql(
      s"SELECT count(*) AS a, count(1) AS b FROM graft_table('$t')")
    assert(rewritten(multi))
    assert(multi.as[(Long, Long)].head() == ((100L, 100L)))
  }

  test("min/max of numeric columns fold from per-file stats; strings decline") {
    val t = tmp("mc_minmax")
    Versioned.commit(spark, t,
      (1L to 80L).map(k => (k, k.toDouble / 4, s"v$k")).toDF("k", "x", "v"),
      Some("k"), 4)
    val mm = spark.sql(
      s"SELECT count(*) AS n, min(k) AS mn, max(k) AS mx, " +
        s"min(x) AS xmn, max(x) AS xmx FROM graft_table('$t')")
    assert(rewritten(mm), "count + numeric min/max all fold together")
    assert(mm.as[(Long, Long, Long, Double, Double)].head() ==
      ((80L, 1L, 80L, 0.25, 20.0)))
    // string min/max: footer stats may truncate long values — a bound,
    // not necessarily a present value. Must scan.
    val sm = spark.sql(s"SELECT min(v) AS mn FROM graft_table('$t')")
    assert(!rewritten(sm), "string extremes never fold")
    assert(sm.as[String].head() == "v1")
    // mixed foldable + unfoldable: all-or-nothing, the whole agg scans
    val mixed = spark.sql(
      s"SELECT count(*) AS n, min(v) AS mn FROM graft_table('$t')")
    assert(!rewritten(mixed))
  }

  test("a Filter blocks the rewrite; result still exact") {
    val t = tmp("mc_filter")
    Versioned.commit(spark, t,
      (1L to 60L).map(k => (k, s"v$k")).toDF("k", "v"), Some("k"), 3)
    val df = spark.sql(
      s"SELECT count(*) AS n FROM graft_table('$t') WHERE k <= 20")
    assert(!rewritten(df), "a Filter between count and scan must scan")
    assert(df.as[Long].head() == 20L)
  }

  test("deletion vectors disqualify: logical count, not physical") {
    val t = tmp("mc_dv")
    Versioned.commit(spark, t,
      (1L to 50L).map(k => (k, s"v$k")).toDF("k", "v"), Some("k"), 2)
    Versioned.deleteMergeOnRead(spark, t, Seq(3L, 7L, 9L).toDF("k"), "k")
    val df = spark.sql(s"SELECT count(*) AS n FROM graft_table('$t')")
    assert(!rewritten(df),
      "a DV'd snapshot plans the anti-join — manifest rows are physical")
    assert(df.as[Long].head() == 47L)
  }

  test("count(col) and DISTINCT are never rewritten") {
    val t = tmp("mc_col")
    Versioned.commit(spark, t,
      (1L to 30L).map(k => (k, if (k % 3 == 0) null else s"g${k % 4}"))
        .toDF("k", "v"), Some("k"), 2)
    val byCol = spark.sql(s"SELECT count(v) AS n FROM graft_table('$t')")
    assert(!rewritten(byCol), "count(col) skips nulls — must scan")
    assert(byCol.as[Long].head() == 20L)
    val dist = spark.sql(
      s"SELECT count(DISTINCT v) AS n FROM graft_table('$t')")
    assert(!rewritten(dist))
    assert(dist.as[Long].head() == 4L) // g0..g3 among non-null rows
  }
}
