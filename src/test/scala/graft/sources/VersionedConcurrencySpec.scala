package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The commit protocol's putIfAbsent primitive is
  * rename-without-overwrite. This spec pins that the Hadoop FileSystem
  * in use actually FAILS a rename onto an existing destination (HDFS
  * semantics; raw POSIX rename would silently overwrite and lose a
  * commit), and that racing writers therefore serialize into distinct
  * consecutive versions with no manifest lost. */
class VersionedConcurrencySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("FileSystem.rename refuses an existing destination (putIfAbsent holds)") {
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "vt_rn")
    val fs = new org.apache.hadoop.fs.Path(dir.toString)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def writeFile(name: String, content: String) = {
      val p = new org.apache.hadoop.fs.Path(dir.toString, name)
      val out = fs.create(p, false)
      try out.write(content.getBytes) finally out.close()
      p
    }
    val a = writeFile("a", "first")
    val b = writeFile("b", "second")
    val renamed = fs.rename(b, a)
    assert(!renamed, "rename onto an existing destination must fail")
    val in = fs.open(a)
    val back = try new String(
      org.apache.commons.io.IOUtils.toByteArray(in)) finally in.close()
    assert(back == "first", "the existing manifest must survive the losing rename")
  }

  test("8 racing commits land as 8 distinct consecutive versions") {
    val t = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "vt_race8").toString
    Versioned.commit(spark, t, Seq((0L, "base")).toDF("k", "v"), Some("k"), 1)
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val commits = (1 to 8).map { i =>
        Future(Versioned.commit(spark, t,
          Seq((i.toLong, s"w$i")).toDF("k", "v"), Some("k"), 1))
      }
      val versions = Await.result(Future.sequence(commits), 5.minutes)
      assert(versions.toSet.size == 8, s"every commit owns a distinct version: $versions")
      assert(versions.toSet == (2L to 9L).toSet, s"versions are consecutive: $versions")
      // every published manifest resolves and reads back exactly one row
      (2L to 9L).foreach { v =>
        assert(Versioned.read(spark, t, v).count() == 1)
      }
    } finally pool.shutdown()
  }
}
