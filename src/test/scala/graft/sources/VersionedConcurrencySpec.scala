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
}
