package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference Morton implementation, bit by bit. */
  private def morton(a: Long, b: Long): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }

  test("interleave16 matches the bitwise reference on known and random values") {
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 0L), (0L, 65535L),
      (65535L, 65535L), (12345L, 54321L), (70000L, 3L)) // 70000 wraps mod 65536
    val out = cases.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.interleave16(col("a"), col("b")).as("z"))
      .collect()
    out.foreach { r =>
      assert(r.getLong(2) == morton(r.getLong(0) % 65536, r.getLong(1) % 65536),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("zorderWrite lands files with disjoint zkey ranges (data-skipping layout)") {
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "zorder").toString
    val df = spark.range(0, 4096).select(
      (col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    graft.sources.Lake.zorderWrite(df, dir, "x", "y", files = 8)
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath).sorted
    assert(files.length == 8)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .select(min(ZOrder.interleave16(col("x"), col("y"))).as("lo"),
          max(ZOrder.interleave16(col("x"), col("y"))).as("hi"))
        .head()
      (r.getLong(0), r.getLong(1))
    }
    val sorted = ranges.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2, s"overlap: $hi1 >= $lo2")
      case _ =>
    }
    // and the layout is lossless
    assert(spark.read.parquet(dir).count() == 4096)
  }

  test("mdBucket is uniform-ish and deterministic across evaluations") {
    import graft.operators.CurationQueries
    val b1 = spark.range(0, 2000)
      .select(CurationQueries.mdBucket(col("id")).as("b")).collect().map(_.getLong(0))
    val b2 = spark.range(0, 2000)
      .select(CurationQueries.mdBucket(col("id")).as("b")).collect().map(_.getLong(0))
    assert(b1.sameElements(b2), "deterministic")
    assert(b1.forall(b => b >= 0 && b < 1000))
    // crude uniformity: each decile of the bucket space gets 100..300 of 2000
    val byDecile = b1.groupBy(_ / 100).view.mapValues(_.length)
    byDecile.foreach { case (d, n) => assert(n > 100 && n < 300, s"decile $d: $n") }
  }

  test("SQL-registered md_bucket/zorder_key match the Column API node for node") {
    import graft.operators.CurationQueries
    val df = spark.range(0, 500).select(col("id"), (col("id") * 7 % 300).as("j"))
    df.createOrReplaceTempView("zparity")
    val viaColumn = df.select(col("id"),
      CurationQueries.mdBucket(col("id")).as("mb"),
      ZOrder.interleave16(col("id"), col("j")).as("zk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val viaSql = spark.sql(
      "SELECT id, md_bucket(id) AS mb, zorder_key(id, j) AS zk FROM zparity")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(viaColumn.sortBy(_._1).sameElements(viaSql.sortBy(_._1)))
  }

  test("context packing: every bin except a source's last holds >= budget-crossing docs") {
    import graft.operators.CurationQueries
    val out = CurationQueries.queries("q54_context_packing")(spark, "/root/testdata/sf0.001")
      .collect()
    // bins are consecutive from 0 per source, and doc ranges don't overlap
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val bins = rows.map(_.getLong(1)).sorted
      assert(bins.head == 0 && bins.sameElements(bins.head to bins.last))
      val spans = rows.sortBy(_.getLong(1)).map(r => (r.getLong(4), r.getLong(5)))
      spans.sliding(2).foreach {
        case Array((_, last1), (first2, _)) => assert(last1 < first2)
        case _ =>
      }
    }
  }
}
