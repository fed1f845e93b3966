package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class LakeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), tag).toString

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
