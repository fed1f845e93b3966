package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins for the token (inverted) index: per-file token blooms prune a
  * keyword search to the files that can contain the term, the write
  * paths maintain the index batch-locally, and the in-plan
  * `array_contains(split(lower(col), ' '), w)` pattern prunes through
  * [[VersionedScan]] with no special read API. */
class TokenIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), tag).toString

  /** 100 docs range-partitioned on doc_id into 4 files; only docs
    * 1..10 — the FIRST file — contain the token "needle". */
  private def corpus(tag: String): String = {
    val t = tmp(tag)
    val docs = (1L to 100L).map { i =>
      val text = if (i <= 10) s"alpha needle beta row$i" else s"alpha beta row$i"
      (i, text)
    }.toDF("doc_id", "text")
    Versioned.commit(spark, t, docs, Some("doc_id"), 4)
    Versioned.addTokenIndex(spark, t, "text")
    t
  }

  private def scanFiles(df: DataFrame): Long = {
    df.collect()
    def walk(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[FileSourceScanExec] = p.collect {
      case s: FileSourceScanExec => Seq(s)
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        walk(q.plan)
    }.flatten
    walk(df.queryExecution.executedPlan)
      .find(_.relation.location.isInstanceOf[VersionedFileIndex])
      .getOrElse(fail("no VersionedFileIndex scan"))
      .metrics("numFiles").value
  }

  test("keyword search prunes to the files that can hold the term; exact rows") {
    val t = corpus("tok_prune")
    val hits = Versioned.readKeywordSearch(spark, t, "text", "needle")
    assert(hits.count() == 10)
    assert(hits.inputFiles.length < 4,
      s"token bloom must skip needle-free files, scanned ${hits.inputFiles.length}")
    // a token in every file scans every file (and finds every row)
    val all = Versioned.readKeywordSearch(spark, t, "text", "alpha")
    assert(all.count() == 100 && all.inputFiles.length == 4)
    // a vocabulary miss scans nothing
    val none = Versioned.readKeywordSearch(spark, t, "text", "absent")
    assert(none.count() == 0 && none.inputFiles.isEmpty)
  }

  test("search is case-insensitive (tokens stored lowercased)") {
    val t = corpus("tok_case")
    assert(Versioned.readKeywordSearch(spark, t, "text", "NEEDLE").count() == 10)
  }

  test("appends maintain the index batch-locally; new terms found, old pruning kept") {
    val t = corpus("tok_append")
    Versioned.appendCommit(spark, t,
      Seq((101L, "gamma needle fresh")).toDF("doc_id", "text"))
    val hits = Versioned.readKeywordSearch(spark, t, "text", "needle")
    assert(hits.count() == 11)
    val fresh = Versioned.readKeywordSearch(spark, t, "text", "fresh")
    assert(fresh.count() == 1 && fresh.inputFiles.length == 1,
      "a term only in the appended batch must scan only its file")
  }

  test("in-plan: array_contains(split(lower(text)), w) prunes through VersionedScan") {
    val t = corpus("tok_plan")
    val df = VersionedScan.read(spark, t)
      .filter(array_contains(split(lower(col("text")), " "), "needle"))
    assert(df.count() == 10)
    assert(scanFiles(df) < 4,
      "the keyword predicate must prune files inside the plan")
    // same shape through the SQL TVF front door
    val sql = spark.sql(
      s"SELECT count(*) AS n FROM graft_table('$t') " +
        "WHERE array_contains(split(lower(text), ' '), 'needle')")
    assert(sql.head().getLong(0) == 10)
  }

  test("multi-term AND search prunes on every term's bitset") {
    val t = tmp("tok_multi")
    // 'red' in files 1-2 (docs 1..50), 'blue' in files 2-3 (26..75):
    // the conjunction can only hold in file 2
    val docs = (1L to 100L).map { i =>
      val red = if (i <= 50) " red" else ""
      val blue = if (i > 25 && i <= 75) " blue" else ""
      (i, s"base$red$blue row$i")
    }.toDF("doc_id", "text")
    Versioned.commit(spark, t, docs, Some("doc_id"), 4)
    Versioned.addTokenIndex(spark, t, "text")
    val both = Versioned.readKeywordSearchAll(spark, t, "text",
      Seq("red", "blue"))
    assert(both.count() == 25) // docs 26..50
    assert(both.inputFiles.length == 1,
      s"AND must intersect the per-term candidates, scanned ${both.inputFiles.length}")
    // in-plan: the conjunction prunes conjunct-by-conjunct
    val planned = VersionedScan.read(spark, t)
      .filter(array_contains(split(lower(col("text")), " "), "red") &&
        array_contains(split(lower(col("text")), " "), "blue"))
    assert(planned.count() == 25)
    assert(scanFiles(planned) == 1,
      "both array_contains conjuncts must prune through VersionedScan")
  }

  test("phrase search: whole-token adjacency, term-conjunction pruning") {
    val t = tmp("tok_phrase")
    // "needle point" adjacent only in docs 1..10 (file 1); doc 30 has
    // both tokens NON-adjacent; doc 60 has the phrase mid-token
    // ("pineedle point" must not match "needle point"); 'needle'
    // appears only in files 1-2, so the phrase scan must skip files 3-4
    val docs = (1L to 100L).map { i =>
      val text =
        if (i <= 10) s"alpha needle point row$i"
        else if (i == 30) s"needle alpha point row$i"
        else if (i == 60) s"pineedle point row$i"
        else s"alpha beta row$i"
      (i, text)
    }.toDF("doc_id", "text")
    Versioned.commit(spark, t, docs, Some("doc_id"), 4)
    Versioned.addTokenIndex(spark, t, "text")
    val hits = Versioned.readPhraseSearch(spark, t, "text", "needle point")
    assert(hits.select("doc_id").collect().map(_.getLong(0)).sorted
      === (1L to 10L).toArray,
      "phrase must match adjacency only — not co-occurrence, not mid-token")
    assert(hits.inputFiles.length < 4,
      s"phrase terms must prune via the token blooms, scanned ${hits.inputFiles.length}")
    // case-insensitive like the rest of the search family
    assert(Versioned.readPhraseSearch(spark, t, "text", "Needle POINT")
      .count() == 10)
    // a phrase whose terms never co-occur in one file scans nothing
    assert(Versioned.readPhraseSearch(spark, t, "text", "needle row99")
      .inputFiles.isEmpty)
  }

  test("full rewrite (OPTIMIZE) re-blooms the token index under the new layout") {
    val t = corpus("tok_opt")
    Versioned.compactCommit(spark, t, targetFiles = 2)
    val hits = Versioned.readKeywordSearch(spark, t, "text", "needle")
    assert(hits.count() == 10)
    assert(hits.inputFiles.length < 2,
      "post-OPTIMIZE bitsets must reflect the rewritten files")
  }
}
