package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[Versioned.setIdentity]] — the allocator contract behind q120:
  * dense key-ordered ids per batch off the manifest high-water mark,
  * ALWAYS semantics (supplied values refused), mark preserved across
  * full rewrites, and pre-identity rows reading NULL. */
class IdentitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshTable(tag: String): String =
    Files.createTempDirectory(s"ident_$tag").toString + "/t"

  test("dense key-ordered ids across two appends; pre-identity rows read NULL") {
    import spark.implicits._
    val t = freshTable("dense")
    Versioned.commit(spark, t, Seq((100L, "seed")).toDF("k", "v"), Some("k"), 1)
    Versioned.setIdentity(spark, t, "rid")
    Versioned.appendCommit(spark, t,
      Seq((30L, "a"), (10L, "b"), (20L, "c")).toDF("k", "v"), Some("k"), 2)
    Versioned.appendCommit(spark, t,
      Seq((50L, "d"), (40L, "e")).toDF("k", "v"), Some("k"), 1)
    val rows = Versioned.read(spark, t).select("k", "rid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(rows(100L).isEmpty, "pre-identity row must read NULL")
    // batch 1 ordered by k: 10->1, 20->2, 30->3; batch 2: 40->4, 50->5
    assert(rows(10L).contains(1L) && rows(20L).contains(2L) &&
      rows(30L).contains(3L) && rows(40L).contains(4L) && rows(50L).contains(5L))
    assert(Versioned.snapshot(spark, t).identity.contains(("rid", 6L)))
  }

  test("ALWAYS semantics: a batch supplying the column is refused") {
    import spark.implicits._
    val t = freshTable("always")
    Versioned.commit(spark, t, Seq((1L, "x")).toDF("k", "v"), Some("k"), 1)
    Versioned.setIdentity(spark, t, "rid")
    val e = intercept[IllegalArgumentException] {
      Versioned.appendCommit(spark, t,
        Seq((2L, "y", 99L)).toDF("k", "v", "rid"), Some("k"), 1)
    }
    assert(e.getMessage.contains("GENERATED ALWAYS AS IDENTITY"))
  }

  test("the high-water mark survives a full rewrite") {
    import spark.implicits._
    val t = freshTable("hwm")
    Versioned.commit(spark, t, Seq((1L, "x")).toDF("k", "v"), Some("k"), 1)
    Versioned.setIdentity(spark, t, "rid")
    Versioned.appendCommit(spark, t, Seq((2L, "y")).toDF("k", "v"), Some("k"), 1)
    // OPTIMIZE-style rewrite: ids already materialized carry as data
    Versioned.compactCommit(spark, t, targetFiles = 1)
    assert(Versioned.snapshot(spark, t).identity.contains(("rid", 2L)),
      "the allocator mark must survive the rewrite")
    Versioned.appendCommit(spark, t, Seq((3L, "z")).toDF("k", "v"), Some("k"), 1)
    val rid3 = Versioned.read(spark, t).filter(col("k") === 3L)
      .select("rid").head().getLong(0)
    assert(rid3 == 2L, "post-rewrite append continues from the mark")
  }

  test("multi-partition batch: same ids as a global row_number, no Window in the plan") {
    import org.apache.spark.sql.expressions.Window
    val t = freshTable("par")
    // 5000 unique keys scattered over 8 input partitions — unique keys
    // make "identical to the global-window allocator" well-defined
    // (equal keys admit any permutation under both allocators)
    val batch = spark.range(5000).select(
      pmod(col("id") * 2654435761L, lit(1000003L)).as("k"),
      concat(lit("v"), col("id")).as("v")).repartition(8)
    val (assigned, hold) = Versioned.allocateIdentity(batch, "rid", "k", 7L)
    try {
      val plan = assigned.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"),
        "two-pass allocation must not plan any Window:\n" + plan)
      val got = assigned.select("k", "rid").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = batch.withColumn("rid",
          lit(6L) + row_number().over(Window.orderBy(col("k"))).cast("long"))
        .select("k", "rid").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.size == 5000 && got == want,
        "two-pass ids must equal the global-window allocation")
    } finally hold.unpersist(true)
    // end-to-end through appendCommit: dense range, mark advanced
    import spark.implicits._
    Versioned.commit(spark, t, Seq((-1L, "seed")).toDF("k", "v"), Some("k"), 1)
    Versioned.setIdentity(spark, t, "rid")
    Versioned.appendCommit(spark, t, batch, Some("k"), 4)
    val ids = Versioned.read(spark, t).filter(col("rid").isNotNull)
      .select("rid").as[Long].collect().sorted
    assert(ids.length == 5000 && ids.head == 1L && ids.last == 5000L &&
      ids.distinct.length == 5000, "appendCommit ids must be dense from 1")
    assert(Versioned.snapshot(spark, t).identity.contains(("rid", 5001L)))
  }

  test("declaring identity over an existing column is refused") {
    import spark.implicits._
    val t = freshTable("clash")
    Versioned.commit(spark, t, Seq((1L, "x")).toDF("k", "v"), Some("k"), 1)
    intercept[IllegalArgumentException] {
      Versioned.setIdentity(spark, t, "v")
    }
  }
}
