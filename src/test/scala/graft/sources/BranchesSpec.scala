package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BranchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshTable(tag: String): String =
    Files.createTempDirectory(s"branches_$tag").toString + "/t"

  private def seed(table: String, n: Int = 100): Unit = {
    import spark.implicits._
    Versioned.commit(spark, table,
      (1 to n).map(i => (i.toLong, i.toLong * 10)).toDF("k", "v"),
      Some("k"), files = 2)
  }

  test("branch isolates: commits on the branch never move the parent") {
    val t = freshTable("iso")
    seed(t)
    Branches.create(spark, t, "dev")
    val dev = Branches.root(t, "dev")
    Versioned.commit(spark, dev,
      Versioned.read(spark, dev).withColumn("v", col("v") + 1),
      Some("k"), files = 2, expected = Some(1L))
    assert(Versioned.latestVersion(spark, t) == 1L)
    assert(Versioned.read(spark, t).agg(sum("v")).head().getLong(0) ==
      (1 to 100).map(_ * 10L).sum)
    assert(Branches.read(spark, t, "dev").agg(sum("v")).head().getLong(0) ==
      (1 to 100).map(_ * 10L + 1).sum)
    assert(Branches.list(spark, t) == Seq(("dev", 1L, 2L)))
  }

  test("fast-forward merge lands the branch head; diverged parent is refused") {
    val t = freshTable("ff")
    seed(t)
    Branches.create(spark, t, "dev")
    val dev = Branches.root(t, "dev")
    Versioned.commit(spark, dev,
      Versioned.read(spark, dev).filter(col("k") <= 50),
      Some("k"), files = 2, expected = Some(1L))
    val v = Branches.merge(spark, t, "dev")
    assert(v == 2L)
    assert(Versioned.read(spark, t).count() == 50L)
    // a second branch forked at v1 can no longer fast-forward
    val t2 = freshTable("diverge")
    seed(t2)
    Branches.create(spark, t2, "a")
    Branches.create(spark, t2, "b")
    Versioned.commit(spark, Branches.root(t2, "a"),
      Versioned.read(spark, Branches.root(t2, "a")).filter(col("k") <= 10),
      Some("k"), files = 1, expected = Some(1L))
    Branches.merge(spark, t2, "a")
    Versioned.commit(spark, Branches.root(t2, "b"),
      Versioned.read(spark, Branches.root(t2, "b")).filter(col("k") > 90),
      Some("k"), files = 1, expected = Some(1L))
    intercept[java.util.ConcurrentModificationException] {
      Branches.merge(spark, t2, "b")
    }
    // the refused merge left no trace
    assert(Versioned.latestVersion(spark, t2) == 2L)
    assert(Versioned.read(spark, t2).count() == 10L)
  }

  test("merge after a branch APPEND resolves in the parent (segment domains stay separate)") {
    // the hazard: an appending branch keeps its fork-inherited files in
    // their own manifest segment; a naive merge could carry that BRANCH
    // segment name into the parent, where it cannot resolve. The merge
    // re-homes entries into the parent's path domain instead.
    val t = freshTable("seg")
    seed(t)
    Branches.create(spark, t, "dev")
    val dev = Branches.root(t, "dev")
    import spark.implicits._
    Versioned.appendCommit(spark, dev,
      (101L to 120L).map(i => (i, i * 10)).toDF("k", "v"), Some("k"), files = 1)
    Branches.merge(spark, t, "dev")
    // the merged manifest must parse and read end to end
    val snap = Versioned.snapshot(spark, t)
    assert(snap.files.forall(df => !df.path.startsWith("file:")),
      s"merged entries should be parent-relative, got ${snap.files.map(_.path)}")
    assert(Versioned.read(spark, t).count() == 120L)
    assert(Versioned.read(spark, t).agg(sum("v")).head().getLong(0) ==
      (1 to 120).map(_ * 10L).sum)
  }

  test("merge carries a branch's merge-on-read deletion vector") {
    val t = freshTable("dv")
    seed(t)
    Branches.create(spark, t, "dev")
    val dev = Branches.root(t, "dev")
    import spark.implicits._
    // MoR delete on the BRANCH: no rewrite, a DV sidecar under the
    // branch root; the merged parent must apply it
    Versioned.deleteMergeOnRead(spark, dev,
      Seq(1L, 2L, 3L).toDF("k"), "k")
    assert(Branches.read(spark, t, "dev").count() == 97L)
    Branches.merge(spark, t, "dev")
    assert(Versioned.read(spark, t).count() == 97L)
    assert(Versioned.read(spark, t).filter(col("k") <= 3).count() == 0L)
  }

  test("tags pin a version immutably; re-tagging fails") {
    val t = freshTable("tag")
    seed(t)
    Branches.tag(spark, t, "r1")
    Versioned.commit(spark, t,
      Versioned.read(spark, t).filter(col("k") <= 5), Some("k"), files = 1)
    assert(Branches.readTag(spark, t, "r1").count() == 100L)
    assert(Versioned.read(spark, t).count() == 5L)
    intercept[Exception] { Branches.tag(spark, t, "r1", 2L) }
    assert(Branches.tagVersion(spark, t, "r1") == 1L)
    assert(Branches.tags(spark, t) == Seq(("r1", 1L)))
  }

  test("parent vacuum keeps files a branch still references") {
    val t = freshTable("vacuum")
    seed(t)
    Branches.create(spark, t, "old") // pins v1's files by absolute URI
    // two full rewrites push v1 out of any keepVersions=1 window
    Versioned.commit(spark, t,
      Versioned.read(spark, t).filter(col("k") <= 60), Some("k"), files = 2)
    Versioned.commit(spark, t,
      Versioned.read(spark, t).filter(col("k") <= 30), Some("k"), files = 2)
    val deleted = Versioned.vacuum(spark, t, keepVersions = 1)
    // v2's files are unreferenced by both the kept window and the
    // branch — vacuum must still reclaim those
    assert(deleted > 0, "vacuum reclaimed nothing")
    // the branch (fork = v1) still reads its full snapshot
    assert(Branches.read(spark, t, "old").count() == 100L)
    assert(Versioned.read(spark, t).count() == 30L)
  }

  test("drop refuses while the parent references merged branch files; detach frees it") {
    val t = freshTable("drop")
    seed(t)
    Branches.create(spark, t, "dev")
    val dev = Branches.root(t, "dev")
    Versioned.commit(spark, dev,
      Versioned.read(spark, dev).withColumn("v", col("v") * 2),
      Some("k"), files = 2, expected = Some(1L))
    Branches.merge(spark, t, "dev")
    intercept[IllegalArgumentException] { Branches.drop(spark, t, "dev") }
    // a full-rewrite commit on the parent re-homes all data
    Versioned.compactCommit(spark, t, targetFiles = 2)
    Branches.drop(spark, t, "dev")
    assert(Branches.list(spark, t).isEmpty)
    assert(Versioned.read(spark, t).agg(sum("v")).head().getLong(0) ==
      (1 to 100).map(_ * 20L).sum)
  }
}
