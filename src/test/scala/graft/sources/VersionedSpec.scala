package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Commit-log protocol pins for [[Versioned]]: atomic manifest
  * publication, snapshot isolation, footer-stats file skipping, the
  * concurrency retry, and vacuum's keep-window contract. */
class VersionedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), tag).toString

  private def table(rows: Seq[(Long, String)], tag: String,
      files: Int = 2): String = {
    val t = tmp(tag)
    Versioned.commit(spark, t, rows.toDF("k", "v"), Some("k"), files)
    t
  }

  test("commit + read round-trips; versions are sequential") {
    val t = table(Seq((1L, "a"), (2L, "b"), (3L, "c")), "vt_rt")
    assert(Versioned.latestVersion(spark, t) == 1L)
    assert(Versioned.commit(spark, t, Seq((9L, "z")).toDF("k", "v"), Some("k"), 1) == 2L)
    assert(Versioned.read(spark, t, 1).count() == 3)
    assert(Versioned.read(spark, t, 2).count() == 1)
    assert(Versioned.read(spark, t).count() == 1, "unversioned read = latest")
  }

  test("snapshot isolation: a v1 reader's file list is pinned; v2 never leaks in") {
    val t = table(Seq((1L, "a"), (2L, "b")), "vt_iso")
    val v1Files = Versioned.read(spark, t, 1).inputFiles.toSet
    Versioned.mergeCommit(spark, t, Seq((2L, "B"), (3L, "c")).toDF("k", "v"), Seq("k"))
    val v1Again = Versioned.read(spark, t, 1)
    assert(v1Again.inputFiles.toSet == v1Files,
      "v1 scan reads exactly the v1 manifest's files after a later commit")
    assert(v1Again.orderBy("k").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b")), "v1 rows unchanged by the v2 merge")
    assert(Versioned.read(spark, t, 2).orderBy("k").as[(Long, String)]
      .collect().toSeq == Seq((1L, "a"), (2L, "B"), (3L, "c")))
  }

  test("manifest stats come from footers and bound each file's key range") {
    val t = table((1L to 100L).map(k => (k, s"v$k")), "vt_stats", files = 4)
    val snap = Versioned.snapshot(spark, t, 1)
    assert(snap.files.size == 4)
    assert(snap.files.map(_.rows).sum == 100L)
    snap.files.foreach { f =>
      assert(f.minKey.isDefined && f.maxKey.isDefined && f.minKey.get <= f.maxKey.get)
    }
    // range-partitioned commit ⇒ the per-file ranges are disjoint
    val sorted = snap.files.sortBy(_.minKey.get)
    sorted.sliding(2).foreach {
      case Seq(a, b) => assert(a.maxKey.get < b.minKey.get)
      case _ =>
    }
  }

  test("deleteWhereKeyIn rewrites only intersecting files; the rest carry by reference") {
    val t = table((1L to 100L).map(k => (k, s"v$k")), "vt_del", files = 4)
    val before = Versioned.snapshot(spark, t, 1)
    def fileState(rel: String) = {
      val p = java.nio.file.Paths.get(t, rel)
      (java.nio.file.Files.size(p), java.nio.file.Files.getLastModifiedTime(p))
    }
    val stateBefore = before.files.map(f => f.path -> fileState(f.path)).toMap
    // tombstones confined to the low end of the key range: only the
    // file(s) covering [1, 5] may be rewritten
    val v2 = Versioned.deleteWhereKeyIn(spark, t,
      Seq(2L, 4L).toDF("k"), "k")
    val after = Versioned.snapshot(spark, t, v2)
    val carried = after.files.map(_.path).toSet intersect before.files.map(_.path).toSet
    assert(carried.size == 3, s"3 of 4 files carried untouched, got $carried")
    // carried by REFERENCE: same path AND byte-identical — size + mtime
    // unchanged, so the delete never rewrote (or even re-landed) them
    carried.foreach { rel =>
      assert(fileState(rel) == stateBefore(rel), s"$rel was touched by the delete")
    }
    assert(Versioned.read(spark, t, v2).count() == 98)
    assert(Versioned.read(spark, t, v2).filter(col("k").isin(2L, 4L)).count() == 0)
    // time travel across the delete still sees the erased keys at v1
    assert(Versioned.read(spark, t, 1).filter(col("k").isin(2L, 4L)).count() == 2)
  }

  test("replaceWhereRange rewrites only intersecting files and restates the range") {
    val t = table((1L to 100L).map(k => (k, s"v$k")), "vt_rw", files = 4)
    val before = Versioned.snapshot(spark, t, 1)
    def fileState(rel: String) = {
      val p = java.nio.file.Paths.get(t, rel)
      (java.nio.file.Files.size(p), java.nio.file.Files.getLastModifiedTime(p))
    }
    val stateBefore = before.files.map(f => f.path -> fileState(f.path)).toMap
    // replace [1, 20] with half as many restated rows; out-of-range
    // replacement rows (k=999) must be dropped, not written
    val v2 = Versioned.replaceWhereRange(spark, t, lo = 1L, hi = 20L,
      (1L to 10L).map(k => (k, s"r$k")).toDF("k", "v")
        .unionByName(Seq((999L, "out")).toDF("k", "v")))
    val after = Versioned.snapshot(spark, t, v2)
    val carried = after.files.map(_.path).toSet intersect before.files.map(_.path).toSet
    assert(carried.size == 3, s"3 of 4 files carried untouched, got $carried")
    carried.foreach { rel =>
      assert(fileState(rel) == stateBefore(rel), s"$rel was touched by the replace")
    }
    val now = Versioned.read(spark, t, v2)
    assert(now.count() == 90, "80 untouched + 10 restated")
    assert(now.filter(col("k") <= 20L).count() == 10)
    assert(now.filter(col("v") === "out").count() == 0, "out-of-range row leaked in")
    assert(now.filter(col("k") === 1L).select("v").head().getString(0) == "r1")
    // v1 readers keep the pre-replace population (snapshot isolation)
    assert(Versioned.read(spark, t, 1).count() == 100)
    // idempotent under txn replay
    val v3 = Versioned.replaceWhereRange(spark, t, 1L, 20L,
      Seq((1L, "again")).toDF("k", "v"), txn = Some("rw-1"))
    assert(Versioned.replaceWhereRange(spark, t, 1L, 20L,
      Seq((1L, "twice")).toDF("k", "v"), txn = Some("rw-1")) == v3)
    assert(Versioned.read(spark, t).filter(col("v") === "twice").count() == 0)
  }

  test("publish retries past an occupied version slot (optimistic concurrency)") {
    val t = table(Seq((1L, "a")), "vt_race")
    // simulate a concurrent winner: v2's manifest already exists
    val v2 = java.nio.file.Paths.get(t, "_versions", "v00000002.json")
    java.nio.file.Files.write(v2, "{\"files\":[]}".getBytes)
    val got = Versioned.commit(spark, t, Seq((5L, "e")).toDF("k", "v"), Some("k"), 1)
    assert(got == 3L, s"losing writer re-targets the next slot, got $got")
    assert(Versioned.read(spark, t, 3).count() == 1)
  }

  test("vacuum drops only unreferenced files; kept versions stay exactly readable") {
    val t = table(Seq((1L, "a"), (2L, "b")), "vt_vac")
    Versioned.deleteWhereKeyIn(spark, t, Seq(1L).toDF("k"), "k") // v2
    Versioned.mergeCommit(spark, t, Seq((7L, "g")).toDF("k", "v"), Seq("k")) // v3
    val deleted = Versioned.vacuum(spark, t, keepVersions = 2)
    assert(deleted > 0, "v1-only files were collected")
    assert(Versioned.read(spark, t, 2).count() == 1)
    assert(Versioned.read(spark, t, 3).orderBy("k").as[(Long, String)]
      .collect().toSeq == Seq((2L, "b"), (7L, "g")))
    intercept[Exception] { Versioned.read(spark, t, 1).count() }
    // keep < 1 is refused BEFORE anything is touched: an empty kept
    // set would GC the live version's data out from under its manifest
    val err = intercept[IllegalArgumentException] {
      Versioned.vacuum(spark, t, keepVersions = 0)
    }
    assert(err.getMessage.contains("at least the current version"), err.getMessage)
    assert(Versioned.read(spark, t, 3).count() == 2,
      "a refused vacuum must leave the table fully readable")
  }

  test("vacuum reclaims orphaned never-published commits; retention spares young files") {
    val t = table(Seq((1L, "a"), (2L, "b")), "vt_orph")
    // simulate a writer that died after landing data, before publish:
    // an unreferenced data/c_* directory
    val orphan = new org.apache.hadoop.fs.Path(t, "data/c_orphandead")
    Seq((9L, "z")).toDF("k", "v").write.parquet(orphan.toString)
    // a retention window spares the fresh orphan (in-flight protection)
    val sparedRun = Versioned.vacuum(spark, t, keepVersions = 2,
      minAgeMs = 60L * 60000L)
    val f = orphan.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(f.exists(orphan),
      s"fresh files survive a retention-guarded vacuum (deleted $sparedRun)")
    // without retention the orphan is garbage and goes
    val deleted = Versioned.vacuum(spark, t, keepVersions = 2)
    assert(deleted > 0, "orphaned commit files collected")
    assert(!f.listStatus(new org.apache.hadoop.fs.Path(t, "data"))
      .map(_.getPath.getName).contains("c_orphandead") ||
      f.listStatus(orphan).isEmpty, "orphan directory emptied")
    assert(Versioned.read(spark, t).count() == 2, "live data untouched")
  }

  test("convertInPlace adopts plain parquet by reference; lifecycle applies") {
    val dir = java.nio.file.Files.createTempDirectory("vt_cvt").toString
    spark.range(1, 101).selectExpr("id AS k", "id * 2 AS v")
      .repartitionByRange(3, $"k").sortWithinPartitions("k")
      .write.mode("overwrite").parquet(dir)
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val originals = f.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(s => (s.getPath.getName, s.getModificationTime)).toMap
    val v1 = Versioned.convertInPlace(spark, dir, Some("k"))
    assert(v1 == 1L)
    val snap = Versioned.snapshot(spark, dir)
    assert(snap.files.size == 3 && snap.files.forall(df =>
      originals.contains(new org.apache.hadoop.fs.Path(df.path).getName)),
      "manifest references exactly the pre-existing files")
    // adopted files untouched (same mtimes: adopted, not rewritten)
    f.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(_.getPath.getName.endsWith(".parquet"))
      .foreach(s => assert(
        originals(s.getPath.getName) == s.getModificationTime))
    // stats were harvested: a key-range read prunes to one file
    val pruned = Versioned.readKeyRange(spark, dir, 1L, 20L)
    assert(pruned.count() == 20L)
    // the mutation surface works on the adopted table
    Versioned.appendCommit(spark, dir,
      spark.range(200, 203).selectExpr("id AS k", "id AS v"), Some("k"))
    assert(Versioned.read(spark, dir).count() == 103L)
    assert(Versioned.read(spark, dir, 1).count() == 100L, "v1 time travel")
    // double conversion refused; partitioned layout refused
    intercept[IllegalArgumentException](
      Versioned.convertInPlace(spark, dir, Some("k")))
  }

  test("txn ids make at-least-once mergeCommits idempotent") {
    val t = table(Seq((1L, "a")), "vt_txn")
    val v2 = Versioned.mergeCommit(spark, t, Seq((2L, "b")).toDF("k", "v"),
      Seq("k"), txn = Some("batch-0"))
    assert(v2 == 2L)
    // the foreachBatch retry: same txn id → skipped, version unchanged
    val replay = Versioned.mergeCommit(spark, t, Seq((2L, "b")).toDF("k", "v"),
      Seq("k"), txn = Some("batch-0"))
    assert(replay == v2)
    assert(Versioned.latestVersion(spark, t) == v2)
    // the next real batch commits normally
    val v3 = Versioned.mergeCommit(spark, t, Seq((3L, "c")).toDF("k", "v"),
      Seq("k"), txn = Some("batch-1"))
    assert(v3 == 3L)
    assert(Versioned.read(spark, t).count() == 3)
  }

  test("compactCommit: content-identical next version in fewer files; old version intact") {
    val t = table((1L to 64L).map(k => (k, s"v$k")), "vt_cmp", files = 8)
    assert(Versioned.snapshot(spark, t, 1).files.size == 8)
    val v2 = Versioned.compactCommit(spark, t, targetFiles = 2)
    assert(Versioned.snapshot(spark, t, v2).files.size == 2)
    assert(Versioned.read(spark, t, v2).orderBy("k").collect().toSeq ==
      Versioned.read(spark, t, 1).orderBy("k").collect().toSeq,
      "compaction must not change content")
    assert(Versioned.read(spark, t, 1).inputFiles.length == 8,
      "the old version still reads its own files")
  }

  test("commitWithExpectations splits pass/quarantine exactly; null checks quarantine") {
    val t = tmp("vt_exp")
    val q = tmp("vt_expq")
    // value null for k=4 → the >0 check evaluates null → must quarantine
    val df = Seq((1L, Some(5.0)), (2L, Some(-1.0)), (3L, Some(2.0)), (4L, None))
      .toDF("k", "v")
    val (ver, committed, quarantined, violations) =
      Versioned.commitWithExpectations(spark, t, df,
        Seq("positive" -> (col("v") > 0), "small_key" -> (col("k") < 4)),
        q, Some("k"), files = 1)
    assert(ver == 1L && committed == 2L && quarantined == 2L)
    assert(violations == Map("positive" -> 2L, "small_key" -> 1L))
    assert(Versioned.read(spark, t).select("k").as[Long].collect().sorted.toSeq ==
      Seq(1L, 3L))
    assert(Versioned.read(spark, q).select("k").as[Long].collect().sorted.toSeq ==
      Seq(2L, 4L), "quarantine holds exactly the failing rows")
  }

  test("appendCommit grows the manifest by reference; prior files untouched") {
    val t = tmp("vt_app")
    Versioned.appendCommit(spark, t, Seq((1L, "a")).toDF("k", "v"), Some("k"), 1)
    Versioned.appendCommit(spark, t, Seq((2L, "b")).toDF("k", "v"), Some("k"), 1)
    val v3 = Versioned.appendCommit(spark, t, Seq((3L, "c")).toDF("k", "v"),
      Some("k"), 1, txn = Some("b2"))
    val s2 = Versioned.snapshot(spark, t, 2)
    val s3 = Versioned.snapshot(spark, t, v3)
    assert(s3.files.size == 3 && s2.files.size == 2)
    assert(s2.files.map(_.path).toSet.subsetOf(s3.files.map(_.path).toSet),
      "append carries every prior file by reference")
    // replayed append with the same txn id is a no-op
    assert(Versioned.appendCommit(spark, t, Seq((9L, "x")).toDF("k", "v"),
      Some("k"), 1, txn = Some("b2")) == v3)
    assert(Versioned.read(spark, t).orderBy("k").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    assert(Versioned.read(spark, t, 2).count() == 2, "older snapshot unaffected")
  }

  test("deleteWhereKeyIn on a stats-less table degrades to a correct full rewrite") {
    val t = tmp("vt_nostats")
    Versioned.commit(spark, t, (1L to 10L).map(k => (k, s"v$k")).toDF("k", "v"),
      statsCol = None, files = 2)
    val v2 = Versioned.deleteWhereKeyIn(spark, t, Seq(3L, 9L).toDF("k"), "k")
    val left = Versioned.read(spark, t, v2).select("k").as[Long].collect().sorted
    assert(left.toSeq == (1L to 10L).filterNot(Set(3L, 9L)))
    // no stats ⇒ nothing can be proven untouched ⇒ nothing carried
    val carried = Versioned.snapshot(spark, t, v2).files.map(_.path).toSet
      .intersect(Versioned.snapshot(spark, t, 1).files.map(_.path).toSet)
    assert(carried.isEmpty)
  }

  test("schema evolution is versioned: each snapshot reads its own schema") {
    val t = table(Seq((1L, "a")), "vt_schema", files = 1)
    // v2 adds a column; the commit log pins schema per version, so a
    // v1 reader never sees (or nulls in) the later column
    Versioned.commit(spark, t,
      Seq((1L, "a", 0.5)).toDF("k", "v", "score"), Some("k"), 1)
    assert(Versioned.read(spark, t, 1).columns.toSeq == Seq("k", "v"))
    assert(Versioned.read(spark, t, 2).columns.toSeq == Seq("k", "v", "score"))
    assert(Versioned.read(spark, t, 2).select("score").as[Double].collect().toSeq
      == Seq(0.5))
  }

  test("evolving MERGE widens the schema in one commit; v1 keeps its own") {
    val t = table(Seq((1L, "a"), (2L, "b"), (3L, "c")), "vt_evomerge", files = 1)
    val changes = Seq((2L, "b2", "HI", "U"), (9L, "i", "NEW", "I"))
      .toDF("k", "v", "prio", "op")
    Versioned.commit(spark, t,
      graft.sources.Lake.applyChanges(Versioned.read(spark, t), changes,
        Seq("k"), evolveSchema = true),
      Some("k"), 1, expected = Some(1L))
    // untouched row nulls in, update + insert fill; v1 unchanged
    val v2 = Versioned.read(spark, t).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(v2 == Seq((1L, "a", null), (2L, "b2", "HI"), (3L, "c", null),
      (9L, "i", "NEW")))
    assert(Versioned.read(spark, t, 1).columns.toSeq == Seq("k", "v"))
    // without evolveSchema the same feed is a loud failure, not a
    // silent schema change
    intercept[Exception] {
      graft.sources.Lake.applyChanges(Versioned.read(spark, t, 1), changes, Seq("k"))
    }
  }

  test("generated columns: computed when absent, validated when supplied, " +
      "DDL metadata-only, wrong value aborts atomically") {
    val t = table(Seq((1L, "a"), (2L, "bb")), "vt_gencol", files = 1)
    Versioned.addGeneratedColumn(spark, t, "vlen", "length(v)")
    // metadata-only DDL: identical file list, no data written
    assert(Versioned.snapshot(spark, t).files ==
      Versioned.snapshot(spark, t, 1).files)
    // absent from the batch → computed; pre-DDL rows read null
    Versioned.appendCommit(spark, t, Seq((3L, "ccc")).toDF("k", "v"))
    val rows = Versioned.read(spark, t).orderBy("k").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) -1 else r.getInt(2))).toSeq
    assert(rows == Seq((1L, -1), (2L, -1), (3L, 3)))
    // supplied and correct → passes the gate
    Versioned.appendCommit(spark, t, Seq((4L, "dddd", 4)).toDF("k", "v", "vlen"))
    // supplied and WRONG → atomic reject: no version lands, no rows leak
    val before = Versioned.latestVersion(spark, t)
    intercept[Exception] {
      Versioned.appendCommit(spark, t, Seq((5L, "e", 99)).toDF("k", "v", "vlen"))
    }
    assert(Versioned.latestVersion(spark, t) == before)
    assert(Versioned.read(spark, t).filter(col("k") === 5L).count() == 0)
    // DROP ends enforcement; already-written data stays readable
    Versioned.dropGeneratedColumn(spark, t, "vlen")
    Versioned.appendCommit(spark, t, Seq((6L, "ff", 77)).toDF("k", "v", "vlen"))
    assert(Versioned.read(spark, t).filter(col("k") === 6L)
      .select("vlen").head().getInt(0) == 77)
    // re-declaring over an existing column is refused (would imply a
    // silent rewrite contract)
    intercept[IllegalArgumentException] {
      Versioned.addGeneratedColumn(spark, t, "vlen", "length(v)")
    }
  }

  test("restore is a metadata-only commit: old files by reference, no new data") {
    val t = table((1L to 40L).map(k => (k, s"v$k")), "vt_restore", files = 4)
    val v1Paths = Versioned.snapshot(spark, t, 1).files.map(_.path).toSet
    Versioned.deleteWhereKeyIn(spark, t, Seq(3L, 17L).toDF("k"), "k") // v2
    def dataDirs = java.nio.file.Files.list(java.nio.file.Paths.get(t, "data"))
      .iterator().asScala.size
    val dirsBefore = dataDirs
    val v3 = Versioned.restore(spark, t, toVersion = 1)
    assert(v3 == 3L)
    assert(dataDirs == dirsBefore, "restore landed zero data files")
    assert(Versioned.snapshot(spark, t, v3).files.map(_.path).toSet == v1Paths,
      "the restored manifest IS v1's file list, by reference")
    assert(Versioned.read(spark, t).count() == 40)
    // history preserved: the rolled-back delete remains readable
    assert(Versioned.read(spark, t, 2).count() == 38)
  }

  test("readKeyRange prunes to intersecting files and stays exact") {
    val t = table((1L to 100L).map(k => (k, s"v$k")), "vt_range", files = 4)
    val all = Versioned.snapshot(spark, t, 1).files.size
    val pruned = Versioned.readKeyRange(spark, t, lo = 10L, hi = 20L)
    assert(pruned.inputFiles.length < all,
      s"range scan must touch fewer than all $all files")
    assert(pruned.select("k").as[Long].collect().sorted.toSeq == (10L to 20L),
      "residual filter keeps the pruned read exact")
    // a range beyond every file's stats reads nothing and stays well-typed
    val empty = Versioned.readKeyRange(spark, t, lo = 500L, hi = 600L)
    assert(empty.columns.toSeq == Seq("k", "v") && empty.count() == 0)
  }

  test("stale-base mutations conflict; blind appends rebase past concurrent commits") {
    val t = table((1L to 40L).map(k => (k, s"v$k")), "vt_occ")
    // a concurrent writer lands v2 while our writer still holds v1
    Versioned.appendCommit(spark, t, Seq((100L, "late")).toDF("k", "v"))
    assert(Versioned.latestVersion(spark, t) == 2L)
    // a mutation derived from v1 must NOT silently win the next slot —
    // it would drop v2's append (the lost-update the protocol forbids)
    intercept[java.util.ConcurrentModificationException] {
      Versioned.publish(spark, t, Some("k"),
        Versioned.snapshot(spark, t, 1).files, op = "DELETE",
        expected = Some(1L))
    }
    assert(Versioned.latestVersion(spark, t) == 2L, "failed commit left a version")
    assert(Versioned.read(spark, t).count() == 41, "v2's append was lost")
    // an append derived from v1 REBASES: its manifest is recomputed
    // from the new latest snapshot, so v2's files survive
    val v3 = Versioned.publish(spark, t, Some("k"),
      Versioned.snapshot(spark, t, 1).files, op = "APPEND",
      expected = Some(1L), rebase = Some(snap => snap.files))
    assert(v3 == 3L)
    assert(Versioned.read(spark, t, v3).count() == 41,
      "rebased append must carry the concurrent commit's files")
  }

  test("re-clustering commits evolve the stats column; each version prunes on its own key") {
    val t = tmp("vt_recluster")
    import spark.implicits._
    val rows = (1L to 800L).map(k => (k, 801L - k)).toDF("k", "g")
    Versioned.commit(spark, t, rows, Some("k"), files = 8)
    Versioned.commit(spark, t, Versioned.read(spark, t, 1), Some("g"), files = 8)
    val v1 = Versioned.readKeyRange(spark, t, 150L, 160L, version = 1)
    assert(v1.inputFiles.length == 1 && v1.count() == 11,
      "v1 must prune on its own clustering key k")
    // same key range on v2 would be meaningless — v2 prunes on g
    val v2 = Versioned.readKeyRange(spark, t, 150L, 160L, version = 2)
    assert(v2.inputFiles.length == 1 && v2.count() == 11,
      "v2 must prune on the evolved clustering key g")
    assert(v2.select(min(col("k"))).head().getLong(0) == 641L,
      "v2's range reads filter g, not k")
  }

  test("snapshotDiff degrades gracefully on key-only snapshots") {
    val a = Seq(1L, 2L).toDF("k")
    val b = Seq(2L, 3L).toDF("k")
    val d = Lake.snapshotDiff(a, b, Seq("k"))
      .select("k", "change_type").as[(Long, String)].collect().toMap
    assert(d == Map(1L -> "delete", 3L -> "insert"))
  }

  test("deletion vectors: merge-on-read delete rewrites nothing and accumulates") {
    val t = table((1L to 100L).map(k => (k, s"v$k")), "vt_dv", files = 4)
    val before = Versioned.snapshot(spark, t, 1)
    def fileState = before.files.map { f =>
      val p = java.nio.file.Paths.get(t, f.path)
      f.path -> (java.nio.file.Files.size(p),
        java.nio.file.Files.getLastModifiedTime(p))
    }.toMap
    val s0 = fileState
    Versioned.deleteMergeOnRead(spark, t, Seq(2L, 4L).toDF("k"), "k")
    Versioned.deleteMergeOnRead(spark, t, Seq(4L, 6L).toDF("k"), "k") // overlap
    assert(fileState == s0, "MoR delete touched a data file")
    val snap = Versioned.snapshot(spark, t)
    assert(snap.files.map(_.path) == before.files.map(_.path),
      "manifest file list unchanged")
    assert(snap.dv.isDefined && snap.dvRows.contains(3L), "accumulated DV of {2,4,6}")
    assert(Versioned.read(spark, t).count() == 97)
    assert(Versioned.read(spark, t).filter(col("k").isin(2L, 4L, 6L)).count() == 0)
    // time travel: v1 (no DV) sees everything; restore(v1) resurrects
    assert(Versioned.read(spark, t, 1).count() == 100)
    Versioned.restore(spark, t, 1)
    assert(Versioned.read(spark, t).count() == 100)
    // restore of a DV'd version pins ITS tombstone set
    Versioned.restore(spark, t, 2)
    assert(Versioned.read(spark, t).count() == 98)
    // readKeyRange applies the DV too: keys 1-10 minus v2's {2,4}
    assert(Versioned.readKeyRange(spark, t, 1L, 10L).count() == 8)
  }

  test("OPTIMIZE materializes deletion vectors; vacuum keeps a referenced DV") {
    val t = table((1L to 50L).map(k => (k, s"v$k")), "vt_dvopt", files = 2)
    Versioned.deleteMergeOnRead(spark, t, Seq(5L, 10L).toDF("k"), "k")
    val v3 = Versioned.compactCommit(spark, t, targetFiles = 1)
    val snap = Versioned.snapshot(spark, t, v3)
    assert(snap.dv.isEmpty, "OPTIMIZE purges the DV")
    assert(snap.files.map(_.rows).sum == 48, "deletes physically applied")
    // vacuum keeping v2 (the DV'd version) must keep its sidecar readable
    Versioned.vacuum(spark, t, keepVersions = 2)
    assert(Versioned.read(spark, t, 2).count() == 48, "DV sidecar survived vacuum")
    assert(Versioned.read(spark, t, v3).count() == 48)
  }

  test("MoR upsert: one atomic commit, old positions masked, repeated upserts compose") {
    val t = table((1L to 30L).map(k => (k, s"v$k")), "vt_dvup", files = 2)
    val before = Versioned.snapshot(spark, t, 1)
    // upsert: update key 7, insert key 99
    Versioned.upsertMergeOnRead(spark, t,
      Seq((7L, "SEVEN"), (99L, "new")).toDF("k", "v"), "k")
    val s2 = Versioned.snapshot(spark, t)
    assert(s2.files.map(_.path).take(before.files.size) == before.files.map(_.path),
      "prior files carried by reference")
    assert(s2.files.size > before.files.size, "source rows landed as new files")
    assert(s2.dvRows.contains(1L), "exactly the old occurrence of key 7 is masked")
    val r2 = Versioned.read(spark, t).orderBy("k").as[(Long, String)].collect().toMap
    assert(r2.size == 31 && r2(7L) == "SEVEN" && r2(99L) == "new")
    // second upsert of the SAME key masks the first upsert's row too
    Versioned.upsertMergeOnRead(spark, t, Seq((7L, "SEVEN2")).toDF("k", "v"), "k")
    val r3 = Versioned.read(spark, t)
    assert(r3.count() == 31)
    assert(r3.filter(col("k") === 7L).as[(Long, String)].collect().toSeq ==
      Seq((7L, "SEVEN2")), "positions, not keys: only the newest row survives")
    assert(Versioned.snapshot(spark, t).dvRows.contains(2L))
    // OPTIMIZE folds it all away
    val v = Versioned.compactCommit(spark, t, targetFiles = 1)
    val s4 = Versioned.snapshot(spark, t, v)
    assert(s4.dv.isEmpty && s4.files.map(_.rows).sum == 31)
  }

  test("copy-on-write delete after a MoR delete never resurrects DV'd rows") {
    val t = table((1L to 40L).map(k => (k, s"v$k")), "vt_dvcow", files = 4)
    Versioned.deleteMergeOnRead(spark, t, Seq(3L).toDF("k"), "k")
    // CoW delete touches the low-range file that ALSO holds key 3
    Versioned.deleteWhereKeyIn(spark, t, Seq(5L).toDF("k"), "k")
    val r = Versioned.read(spark, t)
    assert(r.count() == 38)
    assert(r.filter(col("k").isin(3L, 5L)).count() == 0,
      "DV tombstone carried through the CoW rewrite")
    // history's logical rows reflect the live DV
    val rows = Versioned.history(spark, t).orderBy("version")
      .select("n_rows").as[Long].collect().toSeq
    assert(rows == Seq(40L, 39L, 38L))
  }

  test("history reads manifests only: one row per version with op + true row counts") {
    val t = table(Seq((1L, "a"), (2L, "b")), "vt_hist")
    Versioned.appendCommit(spark, t, Seq((3L, "c")).toDF("k", "v"), txn = Some("b1"))
    Versioned.restore(spark, t, 1)
    val h = Versioned.history(spark, t)
      .select("version", "operation", "n_rows")
      .as[(Long, String, Long)].collect().toSeq.sortBy(_._1)
    assert(h == Seq((1L, "COMMIT", 2L), (2L, "APPEND", 3L), (3L, "RESTORE", 2L)))
    // vacuumed versions disappear from history but the rest survive
    Versioned.vacuum(spark, t, keepVersions = 2)
    assert(Versioned.history(spark, t).select("version")
      .as[Long].collect().toSet == Set(2L, 3L))
  }

  test("shallow clone is zero-copy; branch writes are isolated both ways") {
    val src = table((1L to 20L).map(k => (k, s"v$k")), "vt_cl_src", files = 2)
    val dst = tmp("vt_cl_dst")
    Versioned.clone(spark, src, dst)
    // zero-copy: the clone owns NO data files, only a manifest of
    // absolute references into the source
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dst, "data")),
      "clone wrote data files — not a shallow clone")
    assert(Versioned.read(spark, dst).orderBy("k").as[(Long, String)].collect().toSeq ==
      Versioned.read(spark, src).orderBy("k").as[(Long, String)].collect().toSeq)
    val srcSnap = Versioned.snapshot(spark, src)
    def srcState = srcSnap.files.map { f =>
      val p = java.nio.file.Paths.get(src, f.path)
      f.path -> (java.nio.file.Files.size(p),
        java.nio.file.Files.getLastModifiedTime(p))
    }.toMap
    val before = srcState
    // mutate the CLONE: updates land under the clone's own data/,
    // source files byte-identical, source latest version unchanged
    Versioned.mergeCommit(spark, dst, Seq((2L, "X"), (99L, "new")).toDF("k", "v"), Seq("k"))
    assert(srcState == before, "clone mutation touched source data files")
    assert(Versioned.latestVersion(spark, src) == 1L)
    assert(Versioned.read(spark, src).filter(col("v") === "X").count() == 0)
    val cloned = Versioned.read(spark, dst).orderBy("k").as[(Long, String)].collect()
    assert(cloned.length == 21 && cloned.toMap.get(2L).contains("X"))
    // and the other direction: a later SOURCE commit never leaks into
    // the clone's pinned v1 (same immutability argument as time travel)
    Versioned.appendCommit(spark, src, Seq((500L, "late")).toDF("k", "v"))
    assert(Versioned.read(spark, dst, 1).count() == 20)
    // vacuum on the clone scans only its own data/ — source untouched
    Versioned.vacuum(spark, dst, keepVersions = 1)
    assert(srcState == before, "vacuum on the clone reclaimed source files")
    assert(Versioned.read(spark, dst).count() == 21)
  }

  test("manifests record per-column stats: long, double, string, null counts, bytes") {
    val t = tmp("vt_colstats")
    val rows = (1L to 50L).map(k =>
      (k, k * 1.5, f"s$k%02d", if (k % 10 == 0) null else s"v$k"))
    Versioned.commit(spark, t,
      rows.toDF("k", "d", "s", "nullable"), Some("k"), files = 2)
    val snap = Versioned.snapshot(spark, t, 1)
    snap.files.foreach { f =>
      assert(f.bytes > 0L, "file size recorded")
      val k = f.stats("k")
      assert(k.typ == "long" && k.mn.toLong <= k.mx.toLong && k.nulls.contains(0L))
      assert(k.longRange.contains((f.minKey.get, f.maxKey.get)),
        "commit-key fast path mirrors the stats map")
      val d = f.stats("d")
      assert(d.typ == "double" && d.mn.toDouble == f.minKey.get * 1.5)
      val s = f.stats("s")
      assert(s.typ == "string" && s.mn <= s.mx)
    }
    assert(snap.files.map(_.stats("nullable").nulls.get).sum == 5L,
      "null counts merged across row groups and files")
  }

  test("readColRange prunes on a NON-key column when ingest bands it") {
    val t = tmp("vt_nonkey")
    // commit key = k; ingest arrives in 3 tenant-banded batches on `g`
    def batch(gLo: Long, gHi: Long) =
      (1L to 30L).map(k => (gLo * 100 + k, (gLo + gHi) / 2, s"b$gLo"))
        .toDF("k", "g", "v")
    Seq((0L, 9L), (10L, 19L), (20L, 29L)).foreach { case (lo, hi) =>
      Versioned.appendCommit(spark, t, batch(lo, hi), Some("k"), files = 2)
    }
    val v2Files = Versioned.snapshot(spark, t, 2).files.map(_.path).toSet
    val v1Files = Versioned.snapshot(spark, t, 1).files.map(_.path).toSet
    val batch2Paths = (v2Files -- v1Files).map(p =>
      java.nio.file.Paths.get(t).toAbsolutePath.resolve(p).normalize.toString)
    val pruned = Versioned.readColRange(spark, t, "g", 10L, 19L)
    assert(pruned.count() == 30L)
    val scanned = pruned.inputFiles.map(f => new java.net.URI(f).getPath).toSet
    assert(scanned.nonEmpty && scanned.subsetOf(batch2Paths),
      s"non-key range read must scan ONLY the banded batch's files: " +
        s"${scanned -- batch2Paths}")
    // and a provably-disjoint range scans nothing but stays schema-correct
    val empty = Versioned.readColRange(spark, t, "g", 500L, 600L)
    assert(empty.count() == 0L && empty.columns.toSeq == Seq("k", "g", "v"))
    // string-typed pruning uses the same stats map
    val sPruned = Versioned.readColRange(spark, t, "v", "b10", "b10")
    assert(sPruned.count() == 30L)
    assert(sPruned.inputFiles.map(f => new java.net.URI(f).getPath).toSet
      .subsetOf(batch2Paths), "string stats prune too")
  }

  test("reclusterIncremental rewrites only files violating the new spec") {
    val t = tmp("vt_increc")
    // banded ingest: each append tight on `g` (the future cluster key),
    // committed under the OLD clustering on k
    (0 until 3).foreach { b =>
      val lo = b * 1000L
      Versioned.appendCommit(spark, t,
        (0L until 500L).map(i => (b * 10000L + i, lo + i * 2, s"v$i"))
          .toDF("k", "g", "v"), Some("k"), files = 2)
    }
    // one unclustered append spanning the whole g domain — the violator
    // (g decorrelated from k so both its files stay wide)
    Versioned.appendCommit(spark, t,
      (0L until 300L).map(i => (90000L + i, (i * 7919L) % 3000L, s"w$i"))
        .toDF("k", "g", "v"),
      files = 2)
    val before = Versioned.snapshot(spark, t)
    val wide = before.files.filter { f =>
      val r = f.stats("g"); r.mx.toLong - r.mn.toLong > 1500L
    }.map(_.path).toSet
    assert(wide.size == 2, s"the unclustered append's 2 files are wide: $wide")
    val v = Versioned.reclusterIncremental(spark, t, "g", files = 4)
    val after = Versioned.snapshot(spark, t, v)
    assert(after.statsCol.contains("g"), "spec evolved to the new key")
    val carried = after.files.map(_.path).toSet intersect before.files.map(_.path).toSet
    assert(carried == before.files.map(_.path).toSet -- wide,
      "exactly the conforming (tight) files carry by reference")
    // carried entries' minKey/maxKey are re-derived onto the NEW key
    after.files.filter(f => carried(f.path)).foreach { f =>
      assert(f.minKey == f.stats("g").longRange.map(_._1) &&
        f.maxKey == f.stats("g").longRange.map(_._2))
    }
    assert(Versioned.read(spark, t).count() == 1800L)
    // the new spec prunes: a g-range read touches a strict file subset
    val probe = Versioned.readKeyRange(spark, t, 2000L, 2500L)
    assert(probe.inputFiles.length < after.files.size)
    assert(probe.count() ==
      Versioned.read(spark, t).filter(col("g").between(2000L, 2500L)).count())
    // a second tick is metadata-only (everything now conforms)
    val v2 = Versioned.reclusterIncremental(spark, t, "g", files = 4)
    assert(Versioned.snapshot(spark, t, v2).files.map(_.path).toSet ==
      after.files.map(_.path).toSet, "converged: no further rewrites")
  }

  test("compactSmallFiles packs only the small tail toward the target size") {
    val t = tmp("vt_binpack")
    // one large commit, then a streaming-style tail of small appends
    Versioned.commit(spark, t,
      (1L to 6000L).map(k => (k, s"v$k")).toDF("k", "v"), Some("k"), files = 1)
    (0 until 6).foreach { i =>
      val lo = 6001L + i * 300
      Versioned.appendCommit(spark, t,
        (lo until lo + 300).map(k => (k, s"v$k")).toDF("k", "v"), files = 1)
    }
    val before = Versioned.snapshot(spark, t)
    assert(before.files.size == 7)
    val big = before.files.maxBy(_.bytes)
    val smallBytes = before.files.filterNot(_ == big).map(_.bytes).sum
    val target = (smallBytes * 0.55).toLong // expect the tail to pack into 2
    val v = Versioned.compactSmallFiles(spark, t, target)
    val after = Versioned.snapshot(spark, t, v)
    assert(after.files.map(_.path).contains(big.path),
      "the already-large file carries by reference")
    val packed = after.files.filterNot(_.path == big.path)
    assert(packed.size == 2, s"6 small files pack into 2, got ${packed.size}")
    packed.foreach { f =>
      assert(f.bytes > (target * 0.4).toLong && f.bytes < target * 2,
        s"packed file ${f.bytes} B outside the band around target $target B")
    }
    // content identical, clustering preserved (ranges still disjoint)
    assert(Versioned.read(spark, t).count() == 7800L)
    assert(Versioned.read(spark, t).agg(
      org.apache.spark.sql.functions.sum("k")).as[Long].head() ==
      (1L to 7800L).sum)
    val sorted = packed.sortBy(_.minKey.get)
    sorted.sliding(2).foreach {
      case Seq(a, b) => assert(a.maxKey.get < b.minKey.get,
        "packed files keep disjoint key ranges")
      case _ =>
    }
    // a second pass is a no-op: everything is at target now
    assert(Versioned.compactSmallFiles(spark, t, target) == v)
  }

  test("appendWithAutoCompact fires one follow-on OPTIMIZE at the trigger " +
      "and leaves sub-threshold tails alone") {
    val t = tmp("vt_autoc")
    (0 until 6).foreach { i =>
      val lo = 1L + i * 100
      Versioned.appendWithAutoCompact(spark, t,
        (lo until lo + 100).map(k => (k, s"v$k")).toDF("k", "v"),
        Some("k"), files = 1,
        targetBytes = 256L << 20, minSmallFiles = 4)
    }
    val hist = Versioned.history(spark, t)
      .select("version", "operation").as[(Long, String)].collect().toSeq
    assert(hist.map(_._2) ==
      Seq("APPEND", "APPEND", "APPEND", "APPEND", "OPTIMIZE",
        "APPEND", "APPEND"),
      s"compact fires exactly once, at the 4-small-file trigger: $hist")
    assert(Versioned.snapshot(spark, t).files.size == 3,
      "1 packed + 2 sub-trigger appends")
    assert(Versioned.read(spark, t).count() == 600L,
      "auto-compact never changes the data")
  }

  test("exportSnapshot: plain table → symlink manifest (zero copy, pinned " +
      "against later commits); DV/mapping → materialized parquet") {
    val t = tmp("vt_exp")
    Versioned.commit(spark, t,
      (1L to 100L).map(k => (k, s"v$k")).toDF("k", "v"), Some("k"), 2)
    val out1 = tmp("vt_exp_out1")
    val (uris, mat) = Versioned.exportSnapshot(spark, t, out1)
    assert(!mat, "no DV/mapping/defaults ⇒ symlink manifest, no data copied")
    // compare by filesystem path: Hadoop renders file:/, Spark file:///
    def norm(u: String) = new org.apache.hadoop.fs.Path(u).toUri.getPath
    assert(uris.map(norm).toSet ==
      Versioned.read(spark, t).inputFiles.map(norm).toSet,
      "manifest lists exactly the snapshot's files")
    // later mutation must not leak into the already-written export
    Versioned.deleteMergeOnRead(spark, t,
      Seq(1L, 2L).toDF("k"), "k")
    assert(Versioned.readExport(spark, out1).count() == 100L,
      "export pinned the v1 view")
    // the DV'd + renamed snapshot can only export by materializing
    Versioned.renameColumn(spark, t, "v", "val")
    val out2 = tmp("vt_exp_out2")
    val (_, mat2) = Versioned.exportSnapshot(spark, t, out2)
    assert(mat2, "DV + mapping ⇒ materialize")
    val back = Versioned.readExport(spark, out2)
    assert(back.columns.toSeq == Seq("k", "val"),
      "external readers see LOGICAL names")
    assert(back.count() == 98L, "tombstoned rows are subtracted")
  }

  test("column mapping: rename/drop are metadata-only; widen upcasts on read") {
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val t = tmp("vt_map")
    val base = (1L to 40L).map(k => (k, k.toInt * 10, s"c${k % 3}"))
      .toDF("k", "cents", "cat")
    Versioned.commit(spark, t, base, Some("k"), files = 2)
    val v1Files = Versioned.snapshot(spark, t, 1).files.map(_.path).toSet
    // v2: RENAME — same files by reference, new logical name
    Versioned.renameColumn(spark, t, "cents", "price_e2")
    assert(Versioned.snapshot(spark, t, 2).files.map(_.path).toSet == v1Files,
      "rename must not touch data files")
    assert(Versioned.read(spark, t).columns.toSeq == Seq("k", "price_e2", "cat"))
    // v3: append under the LOGICAL name lands physically as `cents`
    Versioned.appendCommit(spark, t,
      Seq((100L, 55, "cx")).toDF("k", "price_e2", "cat"))
    // v4: WIDEN int→long — metadata-only, old int files upcast at scan
    assert(Versioned.read(spark, t).schema("price_e2").dataType == IntegerType)
    Versioned.widenColumn(spark, t, "price_e2")
    assert(Versioned.snapshot(spark, t, 4).files.map(_.path).toSet ==
      Versioned.snapshot(spark, t, 3).files.map(_.path).toSet,
      "widen must not touch data files")
    val wide = Versioned.read(spark, t)
    assert(wide.schema("price_e2").dataType == LongType)
    assert(wide.count() == 41)
    assert(wide.filter(col("k") === 100L).select("price_e2")
      .as[Long].head() == 55L)
    assert(wide.agg(org.apache.spark.sql.functions.sum("price_e2"))
      .as[Long].head() == (1 to 40).map(_ * 10).sum + 55L)
    // post-widen appends land the wide type natively and read back
    Versioned.appendCommit(spark, t,
      Seq((200L, 3000000000L, "cy")).toDF("k", "price_e2", "cat"))
    assert(Versioned.read(spark, t).filter(col("k") === 200L)
      .select("price_e2").as[Long].head() == 3000000000L)
    // time travel: v1 still reads the ORIGINAL name and type
    val v1 = Versioned.read(spark, t, 1)
    assert(v1.columns.toSeq == Seq("k", "cents", "cat"))
    assert(v1.schema("cents").dataType == IntegerType)
    // v6: DROP — metadata-only, column gone logically, files untouched
    val before = Versioned.snapshot(spark, t).files.map(_.path).toSet
    Versioned.dropColumn(spark, t, "cat")
    assert(Versioned.snapshot(spark, t).files.map(_.path).toSet == before)
    assert(Versioned.read(spark, t).columns.toSeq == Seq("k", "price_e2"))
    // keyed mutation through the mapping: logical key still works
    Versioned.deleteWhereKeyIn(spark, t, Seq(200L).toDF("k"), "k")
    assert(Versioned.read(spark, t).count() == 41)
    assert(Versioned.read(spark, t).filter(col("k") === 200L).count() == 0)
    // full rewrite folds the mapping back to identity
    Versioned.compactCommit(spark, t, targetFiles = 1)
    val folded = Versioned.snapshot(spark, t)
    assert(folded.mapping.isEmpty, "OPTIMIZE resets the mapping")
    assert(Versioned.read(spark, t).columns.toSeq == Seq("k", "price_e2"))
    assert(Versioned.read(spark, t).count() == 41)
  }

  test("deleteWhereKeyIn prunes via the per-column stats of a non-commit key") {
    val t = tmp("vt_nonkeydel")
    def batch(tag: Long) =
      (1L to 20L).map(k => (tag * 100 + k, tag, s"v$k")).toDF("k", "g", "v")
    Seq(1L, 2L, 3L).foreach { g =>
      Versioned.appendCommit(spark, t, batch(g), Some("k"), files = 1)
    }
    val before = Versioned.snapshot(spark, t)
    // tombstone on g=2: only batch 2's file intersects [2,2]
    Versioned.deleteWhereKeyIn(spark, t, Seq(2L).toDF("g"), "g")
    val after = Versioned.snapshot(spark, t)
    val carried = after.files.map(_.path).toSet intersect before.files.map(_.path).toSet
    assert(carried.size == 2,
      s"batches 1 and 3 must carry by reference, got $carried")
    assert(Versioned.read(spark, t).count() == 40L)
    assert(Versioned.read(spark, t).filter(col("g") === 2L).count() == 0L)
  }

  test("CHECK constraints: violating batch aborts, no version lands, " +
      "orphan files removed; NULL satisfies (SQL CHECK semantics)") {
    val t = table(Seq((1L, "a"), (2L, "b")), "vt_check")
    Versioned.addCheckConstraint(spark, t, "k_pos", "k > 0")
    val v = Versioned.latestVersion(spark, t)
    intercept[Versioned.ConstraintViolationException] {
      Versioned.appendCommit(spark, t, Seq((-5L, "bad")).toDF("k", "v"))
    }
    assert(Versioned.latestVersion(spark, t) == v, "no version landed")
    assert(Versioned.read(spark, t).count() == 2)
    // the aborted batch's data directory must not linger
    val dataDirs = new java.io.File(t, "data").listFiles().toSeq
    val referenced = Versioned.snapshot(spark, t).files
      .map(f => f.path.split("/")(1)).toSet
    assert(dataDirs.forall(d => referenced.contains(d.getName)),
      s"orphan data dirs left behind: ${dataDirs.map(_.getName)}")
    // NULL k SATISFIES `k > 0` (CHECK semantics) — NOT NULL is its own
    // constraint and rejects it
    Versioned.appendCommit(spark, t,
      Seq((Option.empty[Long], "n")).toDF("k", "v"))
    assert(Versioned.read(spark, t).count() == 3)
    // …and a NOT NULL DDL on the now-null-bearing table fails its own
    // existing-data validation
    intercept[Versioned.ConstraintViolationException] {
      Versioned.addCheckConstraint(spark, t, "k_nn", "k IS NOT NULL")
    }
  }

  test("ADD CONSTRAINT validates existing data; MERGE path enforces; " +
      "DROP lifts the gate") {
    val t = table(Seq((1L, "a"), (-2L, "b")), "vt_checkddl")
    intercept[Versioned.ConstraintViolationException] {
      Versioned.addCheckConstraint(spark, t, "k_pos", "k > 0")
    }
    intercept[IllegalArgumentException] {
      Versioned.addCheckConstraint(spark, t, "dangling", "no_such_col > 0")
    }
    // clean the bad row, add the constraint, then MERGE (which funnels
    // through commit) must enforce it
    Versioned.commit(spark, t, Seq((1L, "a")).toDF("k", "v"), Some("k"), 1)
    Versioned.addCheckConstraint(spark, t, "k_pos", "k > 0")
    intercept[Versioned.ConstraintViolationException] {
      Versioned.mergeCommit(spark, t, Seq((-9L, "bad")).toDF("k", "v"), Seq("k"))
    }
    Versioned.dropCheckConstraint(spark, t, "k_pos")
    Versioned.mergeCommit(spark, t, Seq((-9L, "ok")).toDF("k", "v"), Seq("k"))
    assert(Versioned.read(spark, t).count() == 2)
  }

  test("replaceWhere and MoR upsert enforce CHECK constraints on their " +
      "new rows (no bypass around the commit gate)") {
    val t = tmp("vt_checkrw")
    Versioned.commit(spark, t, (1L to 10L).map(k => (k, k * 2))
      .toDF("k", "x"), Some("k"), 2)
    Versioned.addCheckConstraint(spark, t, "x_pos", "x > 0")
    intercept[Versioned.ConstraintViolationException] {
      Versioned.replaceWhereRange(spark, t, 3L, 5L,
        Seq((4L, -1L)).toDF("k", "x"))
    }
    intercept[Versioned.ConstraintViolationException] {
      Versioned.upsertMergeOnRead(spark, t, Seq((4L, -1L)).toDF("k", "x"), "k")
    }
    assert(Versioned.read(spark, t).count() == 10, "no mutation landed")
    // valid replacements still flow
    Versioned.replaceWhereRange(spark, t, 3L, 5L, Seq((4L, 99L)).toDF("k", "x"))
    assert(Versioned.read(spark, t).count() == 8)
  }

  test("constraint referencing a column absent from the batch is " +
      "vacuously satisfied (schema-merge surfaces it as NULL)") {
    val t = tmp("vt_checkvac")
    Versioned.commit(spark, t,
      Seq((1L, "a", 5L)).toDF("k", "v", "score"), Some("k"), 1)
    Versioned.addCheckConstraint(spark, t, "score_pos", "score > 0")
    // batch without `score`: merged schema reads it as NULL → passes
    Versioned.appendCommit(spark, t, Seq((2L, "b")).toDF("k", "v"))
    assert(Versioned.read(spark, t).count() == 2)
  }

  test("bloom index prunes point lookups where min/max stats cannot, " +
      "and the write path maintains it") {
    val t = tmp("vt_bloom")
    // interleaved layout: every file spans the full key range, so
    // min/max stats admit every file for any key — only blooms prune
    Seq(0L, 1L, 2L).foreach { r =>
      val rows = (1L to 300L).filter(_ % 3 == r).map(k => (k, s"v$k"))
      Versioned.appendCommit(spark, t, rows.toDF("k", "v"), files = 1)
    }
    Versioned.addBloomIndex(spark, t, "k", bits = 1 << 13)
    val snap = Versioned.snapshot(spark, t)
    assert(snap.bloomCfg.contains(("k", 1 << 13, 4)))
    assert(snap.files.forall(_.bloom.exists(_.nonEmpty)))
    // k=5 lives in exactly the r=2 batch file; the other two files'
    // blooms reject it (assert <3 scanned: bloom FPs could admit one)
    val hit = Versioned.readPointLookup(spark, t, "k", 5L)
    assert(hit.inputFiles.length < 3,
      s"bloom should prune, scanned ${hit.inputFiles.length} of 3 files")
    assert(hit.collect().map(_.getString(1)).toSeq == Seq("v5"))
    // an absent key returns empty (possibly zero files scanned)
    assert(Versioned.readPointLookup(spark, t, "k", 999L).count() == 0)
    // append AFTER indexing: the new file blooms on the write path
    Versioned.appendCommit(spark, t, Seq((1000L, "x")).toDF("k", "v"))
    val snap2 = Versioned.snapshot(spark, t)
    assert(snap2.files.forall(_.bloom.isDefined), "new file must be bloomed")
    val hit2 = Versioned.readPointLookup(spark, t, "k", 1000L)
    assert(hit2.collect().map(_.getString(1)).toSeq == Seq("x"))
    assert(hit2.inputFiles.length < 4)
    // full rewrite (OPTIMIZE funnels through commit) keeps the index
    Versioned.compactCommit(spark, t, targetFiles = 2)
    val snap3 = Versioned.snapshot(spark, t)
    assert(snap3.bloomCfg.isDefined && snap3.files.forall(_.bloom.isDefined),
      "rewrite must re-bloom its output")
    assert(Versioned.readPointLookup(spark, t, "k", 5L)
      .collect().map(_.getString(1)).toSeq == Seq("v5"))
    // the index follows its column's LOGICAL identity through a rename:
    // lookups by the new name keep pruning (physical stats key intact)
    Versioned.renameColumn(spark, t, "k", "key_id")
    val renamed = Versioned.readPointLookup(spark, t, "key_id", 5L)
    assert(renamed.collect().map(_.getString(1)).toSeq == Seq("v5"))
    assert(renamed.inputFiles.length < 3, "bloom pruning survives a rename")
    Versioned.renameColumn(spark, t, "key_id", "k")
    // widening the indexed column clears the index (hash-type safety)
    Versioned.widenColumn(spark, t, "k")
    val snap4 = Versioned.snapshot(spark, t)
    assert(snap4.bloomCfg.isEmpty && snap4.files.forall(_.bloom.isEmpty))
    assert(Versioned.readPointLookup(spark, t, "k", 5L).count() == 1,
      "lookup stays correct without the index")
  }

  test("ZORDER commit prunes range reads on BOTH dimensions; " +
      "metadata aggregates answer without I/O") {
    val t = tmp("vt_z")
    val grid = for (x <- 0L until 64L; y <- 0L until 64L)
      yield (x, y, x * 64 + y)
    Versioned.commit(spark, t, grid.toDF("x", "y", "payload"), None, 8)
    // unclustered: every file spans both domains → nothing prunes
    val before = Versioned.readColRange(spark, t, "x", 0L, 7L)
    assert(before.inputFiles.length == 8, "random layout cannot prune")
    Versioned.zorderCommit(spark, t, "x", "y", files = 8)
    val px = Versioned.readColRange(spark, t, "x", 0L, 7L)
    val py = Versioned.readColRange(spark, t, "y", 0L, 7L)
    assert(px.inputFiles.length < 8, s"x-range must prune, got ${px.inputFiles.length}")
    assert(py.inputFiles.length < 8, s"y-range must prune, got ${py.inputFiles.length}")
    assert(px.count() == 8 * 64 && py.count() == 64 * 8)
    // metadata aggregates: count from the manifest equals the scan,
    // and ANY recorded column's range answers from per-column stats
    assert(Versioned.metaCount(spark, t) == 4096L)
    assert(Versioned.metaColRange(spark, t, "y").contains((0L, 63L)))
    assert(Versioned.metaColRange(spark, t, "payload").contains((0L, 4095L)))
    val keyed = tmp("vt_meta")
    Versioned.commit(spark, keyed, (1L to 100L).map(k => (k, s"v$k"))
      .toDF("k", "v"), Some("k"), 4)
    assert(Versioned.metaKeyRange(spark, keyed).contains((1L, 100L)))
    Versioned.deleteMergeOnRead(spark, keyed,
      Seq(100L).toDF("k"), "k")
    assert(Versioned.metaCount(spark, keyed) == 99L,
      "MoR delete keeps the metadata count exact")
    assert(Versioned.metaKeyRange(spark, keyed).isEmpty,
      "a live DV makes the key-range envelope honestly unknown")
  }

  test("manifest segmentation: appends serialize O(batch) entries, " +
      "metadata-only commits serialize none, vacuum GCs segments") {
    val t = tmp("vt_seg")
    Versioned.commit(spark, t, (1L to 40L).map(k => (k, s"v$k"))
      .toDF("k", "v"), Some("k"), 2)
    val s1 = Versioned.snapshot(spark, t)
    assert(s1.segments.size == 1 && s1.segments.head._2.size == 2)
    // append: v1's segment carries BY NAME, only the batch's files
    // serialize into one new segment
    Versioned.appendCommit(spark, t, Seq((100L, "x")).toDF("k", "v"),
      files = 1)
    val s2 = Versioned.snapshot(spark, t)
    assert(s2.segments.size == 2)
    assert(s2.segments.map(_._1).contains(s1.segments.head._1),
      "v1's segment must carry by reference")
    assert(s2.segments.filterNot(_._1 == s1.segments.head._1)
      .head._2.size == 1, "the new segment holds only the batch")
    assert(s2.files.size == 3)
    // metadata-only commit (constraint DDL): every segment carries,
    // nothing new is written
    Versioned.addCheckConstraint(spark, t, "k_pos", "k > 0")
    val s3 = Versioned.snapshot(spark, t)
    assert(s3.segments.map(_._1).toSet == s2.segments.map(_._1).toSet,
      "a metadata-only commit serializes zero file entries")
    // RESTORE carries the restored version's segments verbatim
    Versioned.restore(spark, t, 1)
    val s4 = Versioned.snapshot(spark, t)
    assert(s4.segments.map(_._1) == s1.segments.map(_._1))
    assert(Versioned.read(spark, t).count() == 40)
    // vacuum drops segments only dropped manifests reference
    val segsBefore = new java.io.File(t, "_versions").listFiles()
      .count(_.getName.startsWith("seg_"))
    Versioned.vacuum(spark, t, keepVersions = 1)
    val segsAfter = new java.io.File(t, "_versions").listFiles()
      .count(_.getName.startsWith("seg_"))
    assert(segsAfter < segsBefore,
      s"vacuum must GC unreferenced segments ($segsBefore -> $segsAfter)")
    assert(Versioned.read(spark, t).count() == 40,
      "the kept version still reads after segment GC")
  }

  test("segment count stays bounded under append-heavy history " +
      "(auto-compaction at the maxSegments threshold)") {
    val t = tmp("vt_segbound")
    (1 to Versioned.maxSegments + 4).foreach { i =>
      Versioned.appendCommit(spark, t,
        Seq((i.toLong, s"v$i")).toDF("k", "v"), files = 1)
    }
    val snap = Versioned.snapshot(spark, t)
    assert(snap.segments.size <= Versioned.maxSegments,
      s"segments must fold at the threshold, got ${snap.segments.size}")
    assert(snap.files.size == Versioned.maxSegments + 4,
      "compaction must lose no file entries")
    assert(Versioned.read(spark, t).count() ==
      (Versioned.maxSegments + 4).toLong)
    // every HISTORICAL version still resolves (its segments are only
    // GC'd by vacuum, never by compaction)
    assert(Versioned.read(spark, t, 3).count() == 3L)
  }

  test("range reads speak LOGICAL names on a mapped table and return " +
      "read()'s shape; colliding new column names are refused") {
    val t = tmp("vt_maprange")
    Versioned.commit(spark, t,
      (1L to 40L).map(k => (k, k * 10, s"v$k")).toDF("k", "cents", "v"),
      Some("k"), 2)
    Versioned.renameColumn(spark, t, "cents", "price_e2")
    // stats are keyed by the PHYSICAL name ("cents"); the caller prunes
    // and filters by the logical one
    val r = Versioned.readColRange(spark, t, "price_e2", 100L, 200L)
    assert(r.columns.toSeq == Seq("k", "price_e2", "v"),
      s"logical projection expected, got ${r.columns.toSeq}")
    assert(r.count() == 11)
    assert(r.inputFiles.length == 1, "pruning must still bite via the physical stats key")
    // the fully-pruned branch returns the same logical shape
    val empty = Versioned.readColRange(spark, t, "price_e2", 10000L, 20000L)
    assert(empty.columns.toSeq == r.columns.toSeq && empty.count() == 0)
    // readKeyRange translates the physical commit key back to logical
    assert(Versioned.readKeyRange(spark, t, 1L, 5L).count() == 5)
    // a NEW column named like the physical backing of price_e2 would
    // corrupt reads (two logical columns over one physical) — refused
    intercept[IllegalArgumentException] {
      Versioned.appendCommit(spark, t,
        Seq((100L, 1L, "x", 7L)).toDF("k", "price_e2", "v", "cents"))
    }
  }

  test("snapshotAsOf refuses a table whose manifests predate commit " +
      "timestamps") {
    val t = tmp("vt_nots")
    Versioned.commit(spark, t, Seq((1L, "a")).toDF("k", "v"), Some("k"), 1)
    // strip the ts field to simulate a legacy manifest
    val v1 = new java.io.File(t, "_versions/v00000001.json")
    val json = new String(java.nio.file.Files.readAllBytes(v1.toPath))
    java.nio.file.Files.write(v1.toPath,
      json.replaceAll("\"ts\" : \\d+,?", "").getBytes)
    val e = intercept[IllegalArgumentException] {
      Versioned.snapshotAsOf(spark, t, 1L)
    }
    assert(e.getMessage.contains("predates commit timestamps"))
  }

  test("reader protocol gate: a manifest demanding a future reader " +
      "fails cleanly instead of misreading") {
    val t = table(Seq((1L, "a")), "vt_proto")
    val dir = new java.io.File(t, "_versions")
    val v1 = new java.io.File(dir, "v00000001.json")
    val json = new String(java.nio.file.Files.readAllBytes(v1.toPath))
    assert(json.contains("\"minReader\" : 2"), "writers stamp the protocol")
    // hand-craft a v2 manifest from the future
    val future = json.replace("\"minReader\" : 2", "\"minReader\" : 99")
    java.nio.file.Files.write(new java.io.File(dir, "v00000002.json").toPath,
      future.getBytes)
    val e = intercept[UnsupportedOperationException] {
      Versioned.read(spark, t)
    }
    assert(e.getMessage.contains("reader protocol 99"))
    // older versions stay readable
    assert(Versioned.read(spark, t, 1).count() == 1)
  }

  test("timestamp travel monotonizes a clock regression against the " +
      "version axis") {
    val t = tmp("vt_ts")
    Versioned.commit(spark, t, Seq((1L, "a")).toDF("k", "v"), Some("k"), 1,
      ts = Some(5000L))
    // writer clock regressed: v2 records an EARLIER wall time
    Versioned.appendCommit(spark, t, Seq((2L, "b")).toDF("k", "v"),
      ts = Some(3000L))
    Versioned.appendCommit(spark, t, Seq((3L, "c")).toDF("k", "v"),
      ts = Some(7000L))
    // v2's effective time clamps to v1's 5000 → AS OF 5000 resolves v2
    assert(Versioned.snapshotAsOf(spark, t, 5000L).version == 2L)
    assert(Versioned.snapshotAsOf(spark, t, 6999L).version == 2L)
    assert(Versioned.snapshotAsOf(spark, t, 7000L).version == 3L)
    assert(Versioned.readAsOf(spark, t, 5500L).count() == 2)
    intercept[IllegalArgumentException] {
      Versioned.snapshotAsOf(spark, t, 4999L)
    }
    // the default (no injected ts) path stamps the writer's clock:
    // AS OF "now" resolves the latest version
    val t2 = tmp("vt_tsdefault")
    Versioned.commit(spark, t2, Seq((1L, "a")).toDF("k", "v"), Some("k"), 1)
    Versioned.appendCommit(spark, t2, Seq((2L, "b")).toDF("k", "v"))
    assert(Versioned.snapshotAsOf(spark, t2,
      System.currentTimeMillis() + 60000L).version == 2L)
  }
}
