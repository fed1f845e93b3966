package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[Versioned.cherryPick]] / [[Versioned.revert]] invariants beyond
  * the q117/q118 driver gates: txn idempotency (a replayed pick/revert
  * mints NO new version), history stays intact after revert (it is a
  * commit, not a rewind), and the row-level inverse-delta semantics on
  * each op kind.
  */
class CherryPickRevertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshTable(tag: String): String =
    Files.createTempDirectory(s"cpr_$tag").toString + "/t"

  private def seed(table: String): Unit = {
    import spark.implicits._
    Versioned.commit(spark, table,
      (1 to 20).map(i => (i.toLong, i.toLong * 10)).toDF("k", "v"),
      Some("k"), files = 2)
  }

  private def state(table: String): Map[Long, Long] =
    Versioned.read(spark, table).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("cherry-pick ports one commit's delta; replay is a txn no-op") {
    import spark.implicits._
    val t = freshTable("pick")
    seed(t)
    Branches.create(spark, t, "fix")
    // parent v2: update k=1, insert k=100, delete k=2
    Versioned.mergeCommit(spark, t,
      Seq((1L, 999L), (100L, 1000L)).toDF("k", "v"), Seq("k"))
    Versioned.deleteWhereKeyIn(spark, t, Seq(2L).toDF("k"), "k")
    val dst = Branches.root(t, "fix")
    val v = Versioned.cherryPick(spark, t, 2, dst, "k")
    val picked = state(dst)
    assert(picked(1L) == 999L && picked(100L) == 1000L, "v2's delta applied")
    assert(picked.contains(2L), "v3's unrelated delete NOT picked")
    assert(Versioned.cherryPick(spark, t, 2, dst, "k") == v,
      "replayed pick must return the same version, not apply twice")
    assert(state(dst) == picked)
  }

  test("cherry-picking the delete commit ports D ops") {
    import spark.implicits._
    val t = freshTable("pickdel")
    seed(t)
    Branches.create(spark, t, "fix")
    Versioned.deleteWhereKeyIn(spark, t, Seq(3L, 4L).toDF("k"), "k")
    Versioned.cherryPick(spark, t, 2, Branches.root(t, "fix"), "k")
    val picked = state(Branches.root(t, "fix"))
    assert(!picked.contains(3L) && !picked.contains(4L))
    assert(picked.size == 18)
  }

  test("revert undoes one commit at the head and keeps history intact") {
    import spark.implicits._
    val t = freshTable("rev")
    seed(t)
    // v2: update k=1→999 + insert k=100; v3: delete k=2; v4: delete
    // k=1 (so reverting v2's update must re-insert a later-deleted key)
    Versioned.mergeCommit(spark, t,
      Seq((1L, 999L), (100L, 1000L)).toDF("k", "v"), Seq("k"))
    Versioned.deleteWhereKeyIn(spark, t, Seq(2L).toDF("k"), "k")
    Versioned.deleteWhereKeyIn(spark, t, Seq(1L).toDF("k"), "k")
    val v = Versioned.revert(spark, t, 2, "k")
    assert(v == 5L, "revert is a NEW commit at the head")
    val s = state(t)
    assert(s(1L) == 10L, "update reverted — old value back, re-inserted past v4's delete")
    assert(!s.contains(2L), "v3's unrelated delete untouched by revert(2)")
    assert(!s.contains(100L), "v2's insert reverted — row deleted")
    // reverting the DELETE commit re-inserts its old row
    assert(Versioned.revert(spark, t, 3, "k") == 6L)
    assert(state(t)(2L) == 20L, "v3's delete reverted — old row re-inserted")
    // history intact: every version still readable, ops recorded
    assert(Versioned.read(spark, t, 2).count() == 21) // 20 seed + 1 insert
    val ops = Versioned.history(spark, t).select("version", "operation")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ops(5L) == "REVERT" && ops(6L) == "REVERT")
    assert(Versioned.revert(spark, t, 3, "k") == 6L, "replayed revert is a no-op")
  }
}
