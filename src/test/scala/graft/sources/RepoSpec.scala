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
}
