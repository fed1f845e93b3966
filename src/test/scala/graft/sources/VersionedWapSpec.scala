package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Write-audit-publish pins: staged commits are invisible until
  * publish, auditable as the would-be state, atomic to publish, free
  * to drop, conflict-checked against table-rule changes, and safe
  * from vacuum. */
class VersionedWapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), tag).toString

  private def table(tag: String): String = {
    val t = tmp(tag)
    Versioned.commit(spark, t,
      (1L to 50L).map(k => (k, s"v$k")).toDF("k", "v"), Some("k"), 2)
    t
  }

  test("a staged append is invisible to readers and history until published") {
    val t = table("wap_inv")
    val id = Versioned.stageAppend(spark, t,
      (51L to 60L).map(k => (k, s"v$k")).toDF("k", "v"))
    assert(Versioned.read(spark, t).count() == 50, "live table unchanged")
    assert(Versioned.latestVersion(spark, t) == 1L, "no version landed")
    assert(Versioned.readStaged(spark, t, id).count() == 60,
      "audit view = base + staged batch")
    assert(Versioned.stagedIds(spark, t) == Seq(id))
    val v = Versioned.publishStaged(spark, t, id)
    assert(v == 2L)
    assert(Versioned.read(spark, t).count() == 60)
    assert(Versioned.stagedIds(spark, t).isEmpty, "stage consumed by publish")
    val ops = Versioned.history(spark, t).select("operation")
      .collect().map(_.getString(0)).toSet
    assert(ops.contains("WAP PUBLISH"))
  }

  test("dropStaged removes the staged files; the table never saw them") {
    val t = table("wap_drop")
    val before = Versioned.read(spark, t).inputFiles.toSet
    val id = Versioned.stageAppend(spark, t,
      Seq((99L, "bad")).toDF("k", "v"))
    Versioned.dropStaged(spark, t, id)
    assert(Versioned.stagedIds(spark, t).isEmpty)
    assert(Versioned.read(spark, t).inputFiles.toSet == before)
    assert(Versioned.read(spark, t).count() == 50)
  }

  test("CHECK constraints gate at STAGE time; a violating batch never stages") {
    val t = table("wap_check")
    Versioned.addCheckConstraint(spark, t, "k_pos", "k > 0")
    intercept[Versioned.ConstraintViolationException] {
      Versioned.stageAppend(spark, t, Seq((-1L, "neg")).toDF("k", "v"))
    }
    assert(Versioned.stagedIds(spark, t).isEmpty, "failed stage leaves nothing")
    // conforming batch stages fine under the constraint
    val id = Versioned.stageAppend(spark, t, Seq((51L, "ok")).toDF("k", "v"))
    assert(Versioned.publishStaged(spark, t, id) == 3L)
  }

  test("publish rebases over a concurrent append but refuses rule changes") {
    val t = table("wap_conf")
    val id = Versioned.stageAppend(spark, t,
      (51L to 55L).map(k => (k, s"v$k")).toDF("k", "v"))
    // concurrent plain append: mechanically mergeable, publish rebases
    Versioned.appendCommit(spark, t, Seq((100L, "x")).toDF("k", "v"))
    assert(Versioned.publishStaged(spark, t, id) == 3L)
    assert(Versioned.read(spark, t).count() == 56, "both the append and the stage")
    // rule change since stage: constraint added → staged files are stale
    val id2 = Versioned.stageAppend(spark, t, Seq((200L, "y")).toDF("k", "v"))
    Versioned.addCheckConstraint(spark, t, "k_cap", "k <= 1000")
    intercept[java.util.ConcurrentModificationException] {
      Versioned.publishStaged(spark, t, id2)
    }
    assert(Versioned.stagedIds(spark, t) == Seq(id2),
      "refused publish retains the stage for a re-stage decision")
    Versioned.dropStaged(spark, t, id2)
  }

  test("vacuum never reclaims staged-but-unpublished files") {
    val t = table("wap_vac")
    val id = Versioned.stageAppend(spark, t,
      (51L to 60L).map(k => (k, s"v$k")).toDF("k", "v"))
    // churn versions so vacuum has something to drop
    Versioned.commit(spark, t, (1L to 50L).map(k => (k, s"w$k")).toDF("k", "v"),
      Some("k"), 2)
    Versioned.commit(spark, t, (1L to 50L).map(k => (k, s"x$k")).toDF("k", "v"),
      Some("k"), 2)
    Versioned.vacuum(spark, t, keepVersions = 1)
    // the staged files survived the vacuum: publishing onto the
    // CURRENT (post-churn) snapshot still reads every staged row
    Versioned.publishStaged(spark, t, id)
    val live = Versioned.read(spark, t)
    assert(live.count() == 60)
    assert(live.filter(col("k") >= 51L).count() == 10,
      "staged rows intact after vacuum + publish")
  }
}
