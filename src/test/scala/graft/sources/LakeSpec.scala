package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Hadoop-FS stand-in for an object store: a distinct `mock://` URI
  * scheme backed by local disk. Registering it exercises the SAME
  * resolution path a real `s3a://` bucket takes (scheme → FileSystem
  * impl lookup → committer/lister over the FS API) without network —
  * the S4 connector surface minus the wire protocol. */
class MockObjectStoreFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("mock:///")
}

class LakeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), tag).toString

  test("S4: parquet write + read through a non-file URI scheme (object-store stand-in)") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.mock.impl", classOf[MockObjectStoreFs].getName)
    val dir = java.nio.file.Paths.get(tmp("s4")).toAbsolutePath
    val uri = s"mock://$dir/layer"
    Lake.writeParquet(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), uri)
    val back = Lake.readParquet(spark, uri)
    assert(back.count() == 2)
    assert(back.orderBy("id").collect().map(_.getString(1)).toSeq == Seq("a", "b"))
    // the data really went through the mock scheme, not file://
    assert(java.nio.file.Files.list(dir.resolve("layer"))
      .anyMatch(p => p.toString.endsWith(".parquet")))
  }

  test("schema-merged read unions evolving batch schemas; old files read null") {
    val dir = tmp("merge")
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$dir/batch=1")
    Seq((2L, "b", 9.5)).toDF("id", "v", "score").write.parquet(s"$dir/batch=2")
    val merged = Lake.readParquetMergedSchema(spark, dir)
    assert(merged.columns.toSet == Set("id", "v", "score", "batch"))
    val rows = merged.orderBy("id").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("score")), "old batch reads null")
    assert(rows(1).getDouble(rows(1).fieldIndex("score")) == 9.5)
  }

  test("mergeUpsert: matched rows replaced, unmatched inserted, rest survive; idempotent") {
    val target = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)).toDF("k", "s", "v")
    val source = Seq((2L, "B", 20.0), (4L, "d", 4.0)).toDF("k", "s", "v")
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    val merged = Lake.mergeUpsert(target, source, Seq("k"))
    assert(toMap(merged) == Map(
      1L -> ("a", 1.0), 2L -> ("B", 20.0), 3L -> ("c", 3.0), 4L -> ("d", 4.0)))
    // merging the same source into the merged result changes nothing
    assert(toMap(Lake.mergeUpsert(merged, source, Seq("k"))) == toMap(merged))
  }

  test("mergeUpsert: duplicate source keys fail at execution (MERGE multi-match contract)") {
    val target = Seq((1L, "a", 1.0)).toDF("k", "s", "v")
    val dupSource = Seq((2L, "x", 1.0), (2L, "y", 2.0)).toDF("k", "s", "v")
    val e = intercept[Exception] {
      Lake.mergeUpsert(target, dupSource, Seq("k")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("duplicate source rows")), e.getMessage)
  }

  test("mergeUpsert: null source keys are N legal inserts, not a multi-match") {
    val target = Seq((Some(1L), "a", 1.0)).toDF("k", "s", "v")
    val nullSource = Seq((None: Option[Long], "x", 1.0), (None: Option[Long], "y", 2.0))
      .toDF("k", "s", "v")
    val out = Lake.mergeUpsert(target, nullSource, Seq("k")).collect()
    assert(out.length == 3, "target row survives; both null-keyed source rows insert")
  }

  test("applyChanges: delete wins, update upserts, absent-key delete is a no-op") {
    val target = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)).toDF("k", "s", "v")
    val changes = Seq(
      (2L, "B", 20.0, "U"),   // matched update
      (3L, null, 0.0, "D"),   // matched delete
      (4L, "d", 4.0, "I"),    // not-matched insert
      (5L, "e", 5.0, "U"),    // not-matched update → upserts
      (9L, null, 0.0, "D"))   // absent-key delete → no-op
      .toDF("k", "s", "v", "op")
    val out = Lake.applyChanges(target, changes, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a", 2L -> "B", 4L -> "d", 5L -> "e"))
  }

  test("applyChanges: duplicate change keys fail; null-keyed delete is a no-op") {
    val target = Seq((1L, "a")).toDF("k", "s")
    val dup = Seq((2L, "x", "U"), (2L, "y", "D")).toDF("k", "s", "op")
    val e = intercept[Exception] {
      Lake.applyChanges(target, dup, Seq("k")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("duplicate change rows")), e.getMessage)
    val nullDel = Seq((None: Option[Long], "x", "D")).toDF("k", "s", "op")
    assert(Lake.applyChanges(target, nullDel, Seq("k")).collect().length == 1,
      "null-keyed delete never matches; target row survives")
  }

  test("mergeInto rewrites the parquet layer at a fresh path") {
    val (src, dst) = (tmp("mi_src"), tmp("mi_dst"))
    Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v").write.mode("overwrite").parquet(src)
    Lake.mergeInto(spark, src, dst, Seq((2L, 99.0), (3L, 30.0)).toDF("k", "v"), Seq("k"))
    val out = Lake.readParquet(spark, dst).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out == Map(1L -> 10.0, 2L -> 99.0, 3L -> 30.0))
  }

  test("deleteMatching rewrites the layer without tombstoned keys only") {
    val (src, dst) = (tmp("del_src"), tmp("del_dst"))
    Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("k", "v").write.mode("overwrite").parquet(src)
    Lake.deleteMatching(spark, src, dst, Seq(2L, 4L, 99L).toDF("k"), Seq("k"))
    val out = Lake.readParquet(spark, dst).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a", 3L -> "c"),
      "tombstoned keys gone, absent tombstone (99) is a no-op, schema intact")
  }

  test("snapshotDiff classifies insert/update/delete, drops unchanged, null-safe") {
    val v1 = Seq((1L, Option("a"), 1.0), (2L, Option("b"), 2.0),
      (3L, Option("c"), 3.0), (4L, None: Option[String], 4.0))
      .toDF("k", "s", "v")
    val v2 = Seq((1L, Option("a"), 1.0), (2L, Option("B"), 2.0),
      (4L, Option("now-set"), 4.0), (5L, Option("e"), 5.0))
      .toDF("k", "s", "v")
    val out = Lake.snapshotDiff(v1, v2, Seq("k")).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("change_type")).toMap
    assert(out == Map(2L -> "update", 3L -> "delete",
      4L -> "update", 5L -> "insert"),
      "unchanged k=1 dropped; null→value (k=4) is update, not unchanged")
  }

  test("compaction rewrites many small files into the target count, losslessly") {
    val src = tmp("frag")
    // 32 tiny files
    spark.range(0, 1000).repartition(32).write.mode("overwrite").parquet(src)
    def parquetFiles(p: String) =
      java.nio.file.Files.list(java.nio.file.Paths.get(p))
        .filter(_.toString.endsWith(".parquet")).count()
    assert(parquetFiles(src) == 32)
    val dst = tmp("compact")
    Lake.compactTo(spark, src, dst, targetFiles = 4)
    assert(parquetFiles(dst) == 4)
    assert(Lake.readParquet(spark, dst).count() == 1000)
    assert(Lake.readParquet(spark, dst).agg(sum("id")).head().getLong(0) == 499500L)
  }
}
