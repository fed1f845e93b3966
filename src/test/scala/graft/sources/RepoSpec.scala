package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RepoSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRepo(tag: String): String =
    Files.createTempDirectory(s"repo_$tag").toString + "/r"

  test("a repo version is a consistent cross-table snapshot") {
    val r = freshRepo("consistent")
    val a = Repo.tableRoot(r, "a")
    val b = Repo.tableRoot(r, "b")
    Versioned.commit(spark, a, Seq((1L, 10L)).toDF("k", "v"), Some("k"), 1)
    Versioned.commit(spark, b, Seq((1L, 100L)).toDF("k", "v"), Some("k"), 1)
    Repo.commit(spark, r, Map("a" -> 1L, "b" -> 1L), expected = 0L)
    // txn 2 mutates both; the reader below pins repo v1 AFTER v2 lands
    Versioned.commit(spark, a, Seq((1L, 11L)).toDF("k", "v"), Some("k"), 1)
    Versioned.commit(spark, b, Seq((1L, 101L)).toDF("k", "v"), Some("k"), 1)
    Repo.commit(spark, r, Map("a" -> 2L, "b" -> 2L), expected = 1L)
    assert(Repo.read(spark, r, "a", 1L).head().getLong(1) == 10L)
    assert(Repo.read(spark, r, "b", 1L).head().getLong(1) == 100L)
    assert(Repo.read(spark, r, "a").head().getLong(1) == 11L)
    assert(Repo.read(spark, r, "b").head().getLong(1) == 101L)
  }

  test("nested member names are refused up front — vacuum's pin protection is flat") {
    val r = freshRepo("nested")
    val a = Repo.tableRoot(r, "a")
    Versioned.commit(spark, a, Seq((1L, 10L)).toDF("k", "v"), Some("k"), 1)
    // a nested member would resolve and read, but fall outside the
    // member-vacuum pointer walk — refused before a pointer publishes
    val e = intercept[IllegalArgumentException] {
      Repo.commit(spark, r, Map("idx/centroids" -> 1L), expected = 0L)
    }
    assert(e.getMessage.contains("single path segment"))
    assert(Repo.latestVersion(spark, r) == 0L, "refusal left no pointer")
  }

  test("stale-base repo commits are refused; untouched members carry forward") {
    val r = freshRepo("cas")
    val a = Repo.tableRoot(r, "a")
    val b = Repo.tableRoot(r, "b")
    Versioned.commit(spark, a, Seq((1L, 1L)).toDF("k", "v"), Some("k"), 1)
    Versioned.commit(spark, b, Seq((1L, 1L)).toDF("k", "v"), Some("k"), 1)
    Repo.commit(spark, r, Map("a" -> 1L, "b" -> 1L), expected = 0L)
    // a touches only table a; b's pin carries forward
    Versioned.commit(spark, a, Seq((1L, 2L)).toDF("k", "v"), Some("k"), 1)
    Repo.commit(spark, r, Map("a" -> 2L), expected = 1L)
    assert(Repo.snapshot(spark, r) == Map("a" -> 2L, "b" -> 1L))
    // a second writer deriving from repo v1 loses cleanly
    intercept[java.util.ConcurrentModificationException] {
      Repo.commit(spark, r, Map("b" -> 2L), expected = 1L)
    }
    // the refused commit left no trace
    assert(Repo.latestVersion(spark, r) == 2L)
    intercept[IllegalArgumentException] {
      Repo.read(spark, r, "nope")
    }
  }

  test("the repo resolves in SQL: graft_repo + graft_repo_table") {
    val r = freshRepo("sql")
    val a = Repo.tableRoot(r, "a")
    Versioned.commit(spark, a, Seq((1L, 7L), (2L, 9L)).toDF("k", "v"), Some("k"), 1)
    Repo.commit(spark, r, Map("a" -> 1L), expected = 0L)
    Versioned.commit(spark, a, Seq((1L, 8L)).toDF("k", "v"), Some("k"), 1)
    Repo.commit(spark, r, Map("a" -> 2L), expected = 1L)
    assert(spark.sql(s"SELECT * FROM graft_repo('$r', 1)").collect()
      .map(x => (x.getString(0), x.getLong(1))).toSeq == Seq(("a", 1L)))
    assert(spark.sql(
      s"SELECT sum(v) AS s FROM graft_repo_table('$r', 'a', 1)")
      .head().getLong(0) == 16L)
    assert(spark.sql(
      s"SELECT sum(v) AS s FROM graft_repo_table('$r', 'a')")
      .head().getLong(0) == 8L)
  }

  test("SQL CALL repo_commit/repo_snapshot: pointer flips through the procedure catalog") {
    spark.conf.set("spark.sql.catalog.rgraft", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.rgraft.warehouse",
      Files.createDirectories(
        java.nio.file.Paths.get("target", "rgraft_wh")).toString)
    val r = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "repo_proc").toString + "/r"
    val a = Repo.tableRoot(r, "a")
    val b = Repo.tableRoot(r, "b")
    Versioned.commit(spark, a, Seq((1L, 10L)).toDF("k", "v"), Some("k"), 1)
    Versioned.commit(spark, b, Seq((1L, 100L)).toDF("k", "v"), Some("k"), 1)
    val pins1 = spark.sql(
      s"CALL rgraft.system.repo_commit(repo => '$r', tables => 'a,b')")
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2))).toSeq
    assert(pins1.sorted == Seq((1L, "a", 1L), (1L, "b", 1L)),
      s"first pointer pins both members: $pins1")
    // txn 2 touches only a; b carries forward in the returned map
    Versioned.commit(spark, a, Seq((1L, 11L)).toDF("k", "v"), Some("k"), 1)
    val pins2 = spark.sql(s"CALL rgraft.system.repo_commit(" +
      s"repo => '$r', tables => 'a', expected => 1)")
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2))).toSeq
    assert(pins2.sorted == Seq((2L, "a", 2L), (2L, "b", 1L)), s"$pins2")
    // historical pointers resolve through SQL
    val snap1 = spark.sql(
      s"CALL rgraft.system.repo_snapshot(repo => '$r', version => 1)")
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2))).toSeq
    assert(snap1.sorted == Seq((1L, "a", 1L), (1L, "b", 1L)), s"$snap1")
    // stale-base refusal surfaces through the SQL door too
    val e = intercept[Exception](spark.sql(s"CALL rgraft.system.repo_commit(" +
      s"repo => '$r', tables => 'b', expected => 1)"))
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(
      _.isInstanceOf[java.util.ConcurrentModificationException]),
      s"stale base must refuse: $e")
    assert(Repo.latestVersion(spark, r) == 2L, "refused commit left no trace")
    // a member with no commits is refused before any pointer lands
    val e2 = intercept[Exception](spark.sql(s"CALL rgraft.system.repo_commit(" +
      s"repo => '$r', tables => 'ghost')"))
    assert(causes(e2).exists(t => t.getMessage != null &&
      t.getMessage.contains("no commits")), s"$e2")
  }

  test("member vacuum keeps versions pinned by retained repo pointers") {
    val r = freshRepo("vac")
    val a = Repo.tableRoot(r, "a")
    // v1 and v2 REPLACE each other's files (full commits), so an
    // unpinned vacuum with keepVersions=1 would reclaim v1 wholesale
    Versioned.commit(spark, a, Seq((1L, 10L)).toDF("k", "v"), Some("k"), 1)
    Repo.commit(spark, r, Map("a" -> 1L), expected = 0L)
    Versioned.commit(spark, a, Seq((1L, 11L), (2L, 22L)).toDF("k", "v"),
      Some("k"), 1)
    Versioned.commit(spark, a, Seq((1L, 12L), (3L, 33L)).toDF("k", "v"),
      Some("k"), 1)
    Repo.commit(spark, r, Map("a" -> 3L), expected = 1L)
    Versioned.vacuum(spark, a, keepVersions = 1)
    // the old pointer still resolves: repo v1 pins a@1, whose manifest
    // and data files must have survived the member vacuum
    assert(Repo.read(spark, r, "a", 1L).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap == Map(1L -> 10L),
      "repo v1's pin must still read after member vacuum")
    assert(Repo.read(spark, r, "a").collect().length == 2)
    // the UNPINNED middle version (2) is genuinely gone — vacuum still
    // reclaims what no pointer, branch, or retention window holds
    intercept[Exception](Versioned.snapshot(spark, a, 2L))
    // and through SQL: graft_repo_table at the old pointer
    spark.conf.set("spark.sql.catalog.rvac", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.rvac.warehouse", r)
    val sqlRows = spark.sql(
      s"SELECT v FROM graft_repo_table('$r', 'a', 1) ORDER BY v")
      .collect().map(_.getLong(0)).toSeq
    assert(sqlRows == Seq(10L), "SQL repo read at the old pin survives vacuum")
  }

  test("deleting a pointer manifest releases its pins without bricking vacuum") {
    val r = freshRepo("release")
    val a = Repo.tableRoot(r, "a")
    Versioned.commit(spark, a, Seq((1L, 10L)).toDF("k", "v"), Some("k"), 1)
    Repo.commit(spark, r, Map("a" -> 1L), expected = 0L)
    Versioned.commit(spark, a, Seq((1L, 11L)).toDF("k", "v"), Some("k"), 1)
    Repo.commit(spark, r, Map("a" -> 2L), expected = 1L)
    Versioned.commit(spark, a, Seq((1L, 12L)).toDF("k", "v"), Some("k"), 1)
    Repo.commit(spark, r, Map("a" -> 3L), expected = 2L)
    // release repo v1's pins THE DOCUMENTED WAY: delete its pointer
    val f = Versioned.fs(spark, r)
    assert(f.delete(new org.apache.hadoop.fs.Path(r, "_repo/r00000001.json"),
      false))
    // vacuum must tolerate the gap (a deleted pointer is a release,
    // not corruption), keep v2's pin, and reclaim the released v1
    Versioned.vacuum(spark, a, keepVersions = 1)
    assert(Repo.read(spark, r, "a", 2L).head().getLong(1) == 11L,
      "the retained pointer's pin still reads")
    intercept[Exception](Versioned.snapshot(spark, a, 1L))
  }

  test("SQL repo_commit pins EXPLICIT versions (name:version) against racers") {
    spark.conf.set("spark.sql.catalog.rgraft", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.rgraft.warehouse",
      Files.createDirectories(
        java.nio.file.Paths.get("target", "rgraft_wh")).toString)
    val r = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "repo_pinv").toString + "/r"
    Versioned.commit(spark, Repo.tableRoot(r, "a"),
      Seq((1L, 10L)).toDF("k", "v"), Some("k"), 1)
    Versioned.commit(spark, Repo.tableRoot(r, "b"),
      Seq((1L, 100L)).toDF("k", "v"), Some("k"), 1)
    // a concurrent writer lands a's v2 AFTER this transaction computed
    // its pins — explicit name:version keeps the foreign commit OUT of
    // the pointer (a bare name would leak it in)
    Versioned.commit(spark, Repo.tableRoot(r, "a"),
      Seq((1L, 11L)).toDF("k", "v"), Some("k"), 1)
    val pins = spark.sql(
      s"CALL rgraft.system.repo_commit(repo => '$r', tables => 'a:1,b:1')")
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2))).toSeq
    assert(pins.sorted == Seq((1L, "a", 1L), (1L, "b", 1L)),
      s"explicit pins survive the racer: $pins")
    assert(Repo.read(spark, r, "a", 1L).head().getLong(1) == 10L,
      "repo v1 reads the transaction's OWN version of a, not the racer's")
    // a dangling explicit pin is refused BEFORE the immutable pointer
    // publishes (it would poison the repo version permanently)
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    val e = intercept[Exception](spark.sql(
      s"CALL rgraft.system.repo_commit(repo => '$r', tables => 'a:99')"))
    assert(causes(e).exists(c => c.getMessage != null &&
      c.getMessage.contains("no version 99")), s"$e")
    // a trailing colon is a loud error, never a silent latest pin
    val e2 = intercept[Exception](spark.sql(
      s"CALL rgraft.system.repo_commit(repo => '$r', tables => 'a:')"))
    assert(causes(e2).exists(c => c.getMessage != null &&
      c.getMessage.contains("bad table spec")), s"$e2")
    assert(Repo.latestVersion(spark, r) == 1L, "refusals left no pointer")
  }
}
