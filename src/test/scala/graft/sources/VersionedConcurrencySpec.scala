package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The commit protocol's putIfAbsent primitive (link(2) on local
  * filesystems — local Hadoop RENAME is check-then-act and can silently
  * replace a just-published manifest under a real race, which this
  * suite caught). Pins that a published manifest is never overwritten
  * and that racing writers serialize into distinct consecutive versions
  * with no commit lost. */
class VersionedConcurrencySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("publication never replaces an existing manifest (putIfAbsent holds)") {
    val t = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "vt_put").toString
    Versioned.commit(spark, t, Seq((1L, "a")).toDF("k", "v"), Some("k"), 1)
    // a "concurrent winner" already owns slot 2 — its manifest bytes
    // must survive the next commit verbatim, which must land at 3
    val v2 = java.nio.file.Paths.get(t, "_versions", "v00000002.json")
    java.nio.file.Files.write(v2, "{\"files\":[]}".getBytes)
    val got = Versioned.commit(spark, t, Seq((5L, "e")).toDF("k", "v"), Some("k"), 1)
    assert(got == 3L)
    assert(new String(java.nio.file.Files.readAllBytes(v2)) == "{\"files\":[]}",
      "the occupied slot's manifest must be untouched")
    // no abandoned temp files leak into the log directory
    val leftovers = java.nio.file.Files.list(
      java.nio.file.Paths.get(t, "_versions")).iterator()
    var names = List.empty[String]
    while (leftovers.hasNext) names ::= leftovers.next().getFileName.toString
    assert(!names.exists(_.startsWith(".tmp_")), s"tmp leak: $names")
  }

  test("two waves of 8 racing commits each land as distinct versions, none lost") {
    val t = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "vt_race8").toString
    Versioned.commit(spark, t, Seq((0L, "base")).toDF("k", "v"), Some("k"), 1)
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      // two waves widen the race window that lost a commit under the
      // rename-based primitive
      (0 to 1).foreach { wave =>
        val commits = (1 to 8).map { i =>
          Future(Versioned.commit(spark, t,
            Seq((i.toLong, s"w$wave-$i")).toDF("k", "v"), Some("k"), 1))
        }
        val versions = Await.result(Future.sequence(commits), 5.minutes)
        assert(versions.toSet.size == 8,
          s"every commit owns a distinct version: $versions")
      }
      assert(Versioned.latestVersion(spark, t) == 17L, "16 commits after the base")
      // every published manifest resolves and reads back exactly one row
      (2L to 17L).foreach { v =>
        assert(Versioned.read(spark, t, v).count() == 1)
      }
    } finally pool.shutdown()
  }

  test("appends racing an OPTIMIZE: the append rebases past the " +
      "rewrite, no rows lost either way") {
    val t = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "vt_raceopt").toString
    Versioned.commit(spark, t,
      (1L to 50L).map(k => (k, s"v$k")).toDF("k", "v"), Some("k"), 4)
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val work = Seq(
        Future { Versioned.compactCommit(spark, t, targetFiles = 2); "opt" },
        Future { Versioned.appendCommit(spark, t,
          Seq((100L, "a")).toDF("k", "v"), files = 1); "app1" },
        Future { Versioned.appendCommit(spark, t,
          Seq((101L, "b")).toDF("k", "v"), files = 1); "app2" })
      // the OPTIMIZE derives from v1; if an append lands first the
      // rewrite conflicts (stale base) — a legal outcome for a
      // maintenance op, which simply re-derives. Appends must NEVER
      // fail or lose rows: they rebase past whatever landed.
      val outcomes = work.map(f =>
        Await.ready(f, 5.minutes).value.get.toOption)
      assert(outcomes(1).isDefined && outcomes(2).isDefined,
        "appends must always land")
      val rows = Versioned.read(spark, t).count()
      assert(rows == 52L, s"expected 50 base + 2 appended rows, got $rows")
      assert(Versioned.read(spark, t)
        .filter(org.apache.spark.sql.functions.col("k") >= 100L).count() == 2)
    } finally pool.shutdown()
  }

  test("two racing appends with the SAME txn land the batch exactly once") {
    // sequential replays dedupe at appendCommit's entry check; a TRUE
    // race (both read the same prior before either publishes) must
    // dedupe at the rebase — the loser re-reads the latest snapshot,
    // sees its own txn already landed, and bails out as applied
    // instead of double-appending the batch.
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      (1 to 3).foreach { round =>
        val t = java.nio.file.Files.createTempDirectory(
          java.nio.file.Paths.get("target"), "vt_racetxn").toString
        Versioned.commit(spark, t,
          (1L to 10L).map(k => (k, s"v$k")).toDF("k", "v"), Some("k"), 2)
        val batch = Seq((100L, "x")).toDF("k", "v")
        val work = Seq(
          Future { Versioned.appendCommit(spark, t, batch, files = 1,
            txn = Some(s"batch-$round")) },
          Future { Versioned.appendCommit(spark, t, batch, files = 1,
            txn = Some(s"batch-$round")) })
        val versions = work.map(f => Await.result(f, 5.minutes))
        assert(versions.toSet == Set(2L),
          s"both callers must report the single landed version: $versions")
        assert(Versioned.latestVersion(spark, t) == 2L,
          "the same-txn twin must not mint a second version")
        assert(Versioned.read(spark, t)
          .filter(org.apache.spark.sql.functions.col("k") === 100L)
          .count() == 1L, "the batch must land exactly once")
      }
    } finally pool.shutdown()
  }

  test("txn dedup survives INTERVENING commits (the recent-txn ring)") {
    // a latest-txn-only check misses a replayed batch separated from
    // its first landing by any other writer's commit — the ring keeps
    // the last txnRingSize ids visible to the dedup
    val t = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "vt_txnring").toString
    Versioned.commit(spark, t,
      (1L to 10L).map(k => (k, s"v$k")).toDF("k", "v"), Some("k"), 2)
    Versioned.appendCommit(spark, t, Seq((100L, "x")).toDF("k", "v"),
      files = 1, txn = Some("batch-A"))
    // an UNRELATED commit lands in between
    Versioned.appendCommit(spark, t, Seq((200L, "y")).toDF("k", "v"),
      files = 1, txn = Some("batch-B"))
    // the replayed batch-A must be recognized as applied
    val v = Versioned.appendCommit(spark, t,
      Seq((100L, "x")).toDF("k", "v"), files = 1, txn = Some("batch-A"))
    assert(v == 3L, s"replay must not mint a version (got $v)")
    assert(Versioned.read(spark, t)
      .filter(org.apache.spark.sql.functions.col("k") === 100L)
      .count() == 1L, "the replayed batch must not double-land")
  }

  // ----- the pluggable publisher extension point -------------------

  /** Object-store-style NON-conditional put: exists-check then
    * overwriting copy — what a plain S3 PUT gives you. `onWindow` runs
    * in the race window between the check and the write, letting the
    * spec interleave a concurrent winner deterministically. */
  private class CheckThenActPublisher(onWindow: () => Unit)
      extends Versioned.ManifestPublisher {
    def putIfAbsent(f: org.apache.hadoop.fs.FileSystem,
        tmp: org.apache.hadoop.fs.Path,
        dst: org.apache.hadoop.fs.Path): Boolean = {
      if (f.exists(dst)) return false
      onWindow()
      // overwriting write — replaces whatever landed in the window
      org.apache.hadoop.fs.FileUtil.copy(f, tmp, f, dst, true, true, f.getConf)
      true
    }
  }

  /** True conditional put over a shared lock — the semantics an S3
    * conditional-write / GCS if-generation-match implementation
    * provides. Same injected window, but the final placement re-checks
    * UNDER THE CONDITION, so the loser observes the winner. */
  private class ConditionalPutPublisher(onWindow: () => Unit)
      extends Versioned.ManifestPublisher {
    def putIfAbsent(f: org.apache.hadoop.fs.FileSystem,
        tmp: org.apache.hadoop.fs.Path,
        dst: org.apache.hadoop.fs.Path): Boolean = {
      onWindow()
      ConditionalPutPublisher.lock.synchronized {
        if (f.exists(dst)) false
        else {
          org.apache.hadoop.fs.FileUtil.copy(f, tmp, f, dst, true, true, f.getConf)
          true
        }
      }
    }
  }
  private object ConditionalPutPublisher { val lock = new Object }

  test("a check-then-act publisher LOSES a commit under the injected race — " +
    "the hazard the ManifestPublisher contract forbids") {
    val t = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "vt_racy").toString
    Versioned.commit(spark, t, Seq((1L, "base")).toDF("k", "v"), Some("k"), 1)
    val snap = Versioned.snapshot(spark, t)
    // in the loser's race window, a concurrent winner (atomic Auto
    // publisher) lands version 2 first
    var winnerV = 0L
    val racy = new CheckThenActPublisher(() => {
      winnerV = Versioned.publish(spark, t, snap.statsCol, snap.files,
        op = "WINNER", expected = Some(snap.version))
    })
    val loserV = Versioned.publish(spark, t, snap.statsCol, snap.files,
      op = "LOSER", expected = Some(snap.version), publisher = racy)
    // both "succeeded" into the SAME slot: the winner's manifest was
    // silently replaced — a lost commit
    assert(winnerV == 2L && loserV == 2L)
    assert(Versioned.snapshot(spark, t, 2).op.contains("LOSER"),
      "the non-conditional put overwrote the winner's manifest")
  }

  test("a conditional-put publisher under the SAME race fails cleanly: " +
    "mutations conflict, blind commits retry to the next slot") {
    val t = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "vt_cput").toString
    Versioned.commit(spark, t, Seq((1L, "base")).toDF("k", "v"), Some("k"), 1)
    val snap = Versioned.snapshot(spark, t)
    var fired = false
    def winnerOnce(): Unit = if (!fired) {
      fired = true
      Versioned.publish(spark, t, snap.statsCol, snap.files,
        op = "WINNER", expected = Some(snap.version))
    }
    // expected-set mutation: the loser must THROW, not retry blindly
    intercept[java.util.ConcurrentModificationException] {
      Versioned.publish(spark, t, snap.statsCol, snap.files,
        op = "LOSER", expected = Some(snap.version),
        publisher = new ConditionalPutPublisher(() => winnerOnce()))
    }
    assert(Versioned.snapshot(spark, t, 2).op.contains("WINNER"),
      "the winner's manifest survives the loser's attempt")
    assert(Versioned.latestVersion(spark, t) == 2L)
    // whole-table overwrite (expected=None): last-writer-wins by
    // design — the loser retries into the NEXT free slot, no overwrite
    val snap2 = Versioned.snapshot(spark, t)
    var fired2 = false
    def winner2Once(): Unit = if (!fired2) {
      fired2 = true
      Versioned.publish(spark, t, snap2.statsCol, snap2.files,
        op = "WINNER", expected = Some(snap2.version))
    }
    val v = Versioned.publish(spark, t, snap.statsCol, snap.files,
      op = "BLIND", publisher = new ConditionalPutPublisher(() => winner2Once()))
    assert(v == 4L, s"blind commit slides past the winner's slot, got $v")
    assert(Versioned.snapshot(spark, t, 3).op.contains("WINNER"))
    assert(Versioned.snapshot(spark, t, 4).op.contains("BLIND"))
  }

  test("production ConditionalCreate publisher: end-to-end commit, raced loser fails cleanly") {
    val t = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "vt_ccput").toString
    // the object-store publisher drives the whole public commit path
    Versioned.commit(spark, t, Seq((1L, "base")).toDF("k", "v"), Some("k"), 1,
      publisher = Versioned.ManifestPublisher.ConditionalCreate)
    assert(Versioned.latestVersion(spark, t) == 1L)
    assert(Versioned.read(spark, t).count() == 1L)
    // race: a winner lands version 2 inside the loser's conditional
    // create window — the store's If-None-Match surfaces the conflict
    // and the expected-set mutation must THROW, never overwrite
    val snap = Versioned.snapshot(spark, t)
    var fired = false
    val raced = new Versioned.ManifestPublisher.ConditionalCreate {
      override protected def createExclusive(
          f: org.apache.hadoop.fs.FileSystem,
          dst: org.apache.hadoop.fs.Path): java.io.OutputStream = {
        if (!fired) {
          fired = true
          Versioned.publish(spark, t, snap.statsCol, snap.files,
            op = "WINNER", expected = Some(snap.version))
        }
        super.createExclusive(f, dst)
      }
    }
    intercept[java.util.ConcurrentModificationException] {
      Versioned.publish(spark, t, snap.statsCol, snap.files,
        op = "LOSER", expected = Some(snap.version), publisher = raced)
    }
    assert(Versioned.snapshot(spark, t, 2).op.contains("WINNER"),
      "the winner's manifest survives the raced conditional create")
    assert(Versioned.latestVersion(spark, t) == 2L)
    // conflict paths must not leak temp manifests
    val leftovers = java.nio.file.Files.list(
      java.nio.file.Paths.get(t, "_versions")).iterator()
    var names = List.empty[String]
    while (leftovers.hasNext) names ::= leftovers.next().getFileName.toString
    assert(!names.exists(_.startsWith(".tmp_")), s"tmp leak: $names")
  }

  test("ConditionalCreate: a failed upload frees the slot; conf resolves publishers") {
    val t = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "vt_ccfail").toString
    val dir = new org.apache.hadoop.fs.Path(t, "_versions")
    val f = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.mkdirs(dir)
    val dst = new org.apache.hadoop.fs.Path(dir, "v00000001.json")
    val missingTmp = new org.apache.hadoop.fs.Path(dir, ".tmp_nope")
    // the exclusive create succeeds, the copy then fails (missing tmp):
    // the slot must be FREED, never left holding a truncated manifest
    intercept[java.io.IOException] {
      Versioned.ManifestPublisher.ConditionalCreate
        .putIfAbsent(f, missingTmp, dst)
    }
    assert(!f.exists(dst), "failed upload must not occupy the slot")
    // ...and a retry into the freed slot succeeds
    val tmp = new org.apache.hadoop.fs.Path(dir, ".tmp_ok")
    val o = f.create(tmp, false); o.write("{}".getBytes); o.close()
    assert(Versioned.ManifestPublisher.ConditionalCreate
      .putIfAbsent(f, tmp, dst))
    assert(f.exists(dst))
    // session-conf publisher resolution on an ISOLATED child session
    // (newSession: own conf, shared context) — suites run in parallel
    // over TestSpark.spark, and holding the conf on the shared session
    // would reroute every concurrent suite's commits for the window
    import Versioned.ManifestPublisher
    assert(ManifestPublisher.resolve(spark, ManifestPublisher.Auto)
      eq ManifestPublisher.Auto)
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.manifestPublisher", "conditional-create")
    assert(ManifestPublisher.resolve(s2, ManifestPublisher.Auto)
      eq ManifestPublisher.ConditionalCreate)
    assert(ManifestPublisher.resolve(spark, ManifestPublisher.Auto)
      eq ManifestPublisher.Auto, "the shared session is untouched")
    // explicit argument still wins
    val mine = new ManifestPublisher.ConditionalCreate
    assert(ManifestPublisher.resolve(s2, mine) eq mine)
    // end-to-end: an append under the conf publishes fine
    val t2 = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "vt_ccconf").toString
    // the DataFrame may come from the shared session — publish resolves
    // the publisher from the SESSION ARGUMENT (s2), which is the thing
    // under test
    Versioned.appendCommit(s2, t2, Seq((1L, 2L)).toDF("k", "v"), Some("k"))
    assert(Versioned.read(s2, t2).count() == 1L)
    s2.conf.set("spark.graft.manifestPublisher", "bogus")
    intercept[IllegalArgumentException] {
      ManifestPublisher.resolve(s2, ManifestPublisher.Auto)
    }
  }

  /** A stream advertising the S3A-style abort capability: on such a
    * store the conditional claim happens at CLOSE, so nothing
    * materializes at dst until our own close succeeds — the release
    * path must abort() and must NEVER delete dst (a concurrent winner
    * may have committed the slot). */
  private class FakeAbortable extends java.io.ByteArrayOutputStream
      with org.apache.hadoop.fs.Abortable {
    var aborted = false
    override def abort(): org.apache.hadoop.fs.Abortable.AbortableResult = {
      aborted = true; null
    }
  }

  test("releaseSlot matrix: abort-capable vs create-claims-slot across failure modes") {
    val t = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "vt_ccmatrix").toString
    val dir = new org.apache.hadoop.fs.Path(t, "_versions")
    val f = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.mkdirs(dir)
    def mkTmp(name: String): org.apache.hadoop.fs.Path = {
      val p = new org.apache.hadoop.fs.Path(dir, name)
      val o = f.create(p, false); o.write("{\"files\":[]}".getBytes); o.close()
      p
    }
    val tmp = mkTmp(".tmp_src")
    val missingTmp = new org.apache.hadoop.fs.Path(dir, ".tmp_missing")
    // dst is OWNED BY A CONCURRENT WINNER for the abort-capable cells:
    // until our close succeeds we own nothing there, so no failure of
    // ours may delete it
    val dst = mkTmp("v00000009.json")
    def winnerIntact(): Boolean = {
      val in = f.open(dst)
      val bytes = try org.apache.commons.io.IOUtils.toByteArray(in)
        finally in.close()
      new String(bytes) == "{\"files\":[]}"
    }

    // abort-capable × copy failure: abort fires, winner's dst survives
    val st1 = new FakeAbortable
    val p1 = new Versioned.ManifestPublisher.ConditionalCreate {
      override protected def createExclusive(
          fs: org.apache.hadoop.fs.FileSystem,
          d: org.apache.hadoop.fs.Path): java.io.OutputStream = st1
    }
    intercept[java.io.IOException](p1.putIfAbsent(f, missingTmp, dst))
    assert(st1.aborted, "copy failure on an abort-capable store aborts the upload")
    assert(winnerIntact(), "a failure of OURS must never delete the winner's slot")

    // abort-capable × close-time NON-race failure: abort fires, error
    // propagates, winner's dst survives
    val st2 = new FakeAbortable {
      override def close(): Unit =
        throw new java.io.IOException("connection reset during commit")
    }
    val p2 = new Versioned.ManifestPublisher.ConditionalCreate {
      override protected def createExclusive(
          fs: org.apache.hadoop.fs.FileSystem,
          d: org.apache.hadoop.fs.Path): java.io.OutputStream = st2
    }
    val e2 = intercept[java.io.IOException](p2.putIfAbsent(f, tmp, dst))
    assert(e2.getMessage.contains("connection reset"),
      "a non-race close failure must propagate, not be swallowed")
    assert(st2.aborted && winnerIntact())

    // abort-capable × close-time RACE: a clean raced loser — no abort
    // needed (the store already resolved the conditional write), no
    // exception, winner's dst survives
    val st3 = new FakeAbortable {
      override def close(): Unit =
        throw new org.apache.hadoop.fs.FileAlreadyExistsException(
          "If-None-Match precondition failed")
    }
    val p3 = new Versioned.ManifestPublisher.ConditionalCreate {
      override protected def createExclusive(
          fs: org.apache.hadoop.fs.FileSystem,
          d: org.apache.hadoop.fs.Path): java.io.OutputStream = st3
    }
    assert(!p3.putIfAbsent(f, tmp, dst),
      "close-time precondition loss reports a lost race")
    assert(!st3.aborted && winnerIntact())

    // create-claims-slot × close-time NON-race failure: the exclusive
    // create claimed dst (it is OURS, possibly truncated) — the error
    // propagates AND the slot is freed so retries are not bricked
    val dst2 = new org.apache.hadoop.fs.Path(dir, "v00000010.json")
    val p4 = new Versioned.ManifestPublisher.ConditionalCreate {
      override protected def createExclusive(
          fs: org.apache.hadoop.fs.FileSystem,
          d: org.apache.hadoop.fs.Path): java.io.OutputStream =
        new java.io.FilterOutputStream(fs.create(d, false)) {
          override def close(): Unit = {
            super.close()
            throw new java.io.IOException("flush failed after write")
          }
        }
    }
    val e4 = intercept[java.io.IOException](p4.putIfAbsent(f, tmp, dst2))
    assert(e4.getMessage.contains("flush failed"))
    assert(!f.exists(dst2),
      "a truncated manifest must not occupy the version slot")
    // ...and the freed slot accepts a clean retry
    assert(Versioned.ManifestPublisher.ConditionalCreate
      .putIfAbsent(f, tmp, dst2))
    assert(f.exists(dst2))
  }

  test("ConditionalCreate: a close-time conditional-write loss is a clean raced loser") {
    // On a real object store the If-None-Match check fires when close()
    // commits the PUT — a loser must surface as putIfAbsent=false (the
    // CAS loop's rebase/refuse path), never as a raw FS exception.
    val t = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "vt_ccclose").toString
    val dir = new org.apache.hadoop.fs.Path(t, "_versions")
    val f = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.mkdirs(dir)
    val dst = new org.apache.hadoop.fs.Path(dir, "v00000001.json")
    val tmp = new org.apache.hadoop.fs.Path(dir, ".tmp_x")
    val o = f.create(tmp, false); o.write("{\"files\":[]}".getBytes); o.close()
    val closeLoser = new Versioned.ManifestPublisher.ConditionalCreate {
      override protected def createExclusive(
          fs: org.apache.hadoop.fs.FileSystem,
          d: org.apache.hadoop.fs.Path): java.io.OutputStream =
        new java.io.ByteArrayOutputStream() {
          override def close(): Unit =
            throw new org.apache.hadoop.fs.FileAlreadyExistsException(
              s"$d: If-None-Match precondition failed")
        }
    }
    assert(!closeLoser.putIfAbsent(f, tmp, dst),
      "close-time precondition failure must report a lost race")
    assert(!f.exists(dst))
  }
}
