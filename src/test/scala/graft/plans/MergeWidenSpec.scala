package graft.plans

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Versioned

/** `MERGE ... WITH SCHEMA EVOLUTION` over a source whose column type
  * WIDENED (int→bigint, float→double): the evolving merge routes the
  * type difference through the library's metadata-only widening commit
  * (the q131 `ALTER COLUMN TYPE` path) before the merge itself runs —
  * Delta's merge-evolution behavior. Without the evolution flag the
  * merge still refuses (runtime down-cast overflow), and non-widenable
  * differences are never "evolved" away. */
class MergeWidenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fresh(tag: String): (String, String) = {
    val wh = Files.createTempDirectory(s"mw_$tag").toString
    val cat = s"mw$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (cat, wh)
  }

  test("bigint source over int target: evolving merge widens, then merges") {
    val (cat, wh) = fresh("widen")
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, c INT) TBLPROPERTIES ('key'='k')")
    spark.sql(s"INSERT INTO $cat.t VALUES (1, 10), (2, 20)")
    spark.sql("SELECT * FROM VALUES (2L, 5000000000L), (3L, 30L) AS s(k, c)")
      .createOrReplaceTempView("mw_src")
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.t t USING mw_src s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET t.c = s.c
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val snap = Versioned.snapshot(spark, s"$wh/t")
    assert(snap.physicalSchema.get("c").dataType ==
      org.apache.spark.sql.types.LongType,
      "the evolving merge must widen c to bigint via a metadata commit")
    val rows = spark.sql(s"SELECT k, c FROM $cat.t ORDER BY k").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == Map(1L -> 10L, 2L -> 5000000000L, 3L -> 30L))
    // create + insert + widen + merge = 4 versions: the widening is
    // its own metadata-only commit, not a rewrite
    assert(snap.version == 4L)
  }

  test("without WITH SCHEMA EVOLUTION the down-cast still refuses") {
    val (cat, _) = fresh("plain")
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, c INT) TBLPROPERTIES ('key'='k')")
    spark.sql(s"INSERT INTO $cat.t VALUES (1, 10)")
    spark.sql("SELECT * FROM VALUES (1L, 5000000000L) AS s(k, c)")
      .createOrReplaceTempView("mw_plain_src")
    val e = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $cat.t t USING mw_plain_src s ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET t.c = s.c""".stripMargin)
    }
    assert(e.getMessage.contains("CAST_OVERFLOW") ||
      Option(e.getCause).exists(_.getMessage.contains("CAST_OVERFLOW")),
      s"a non-evolving merge must not silently widen: $e")
  }

  test("non-widenable type difference is not evolved away") {
    val (cat, wh) = fresh("refuse")
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, c INT) TBLPROPERTIES ('key'='k')")
    spark.sql(s"INSERT INTO $cat.t VALUES (1, 10)")
    spark.sql("SELECT * FROM VALUES (1L, 'oops') AS s(k, c)")
      .createOrReplaceTempView("mw_bad_src")
    intercept[Exception] {
      spark.sql(
        s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.t t USING mw_bad_src s ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET t.c = s.c""".stripMargin)
    }
    assert(Versioned.snapshot(spark, s"$wh/t").physicalSchema.get("c")
      .dataType == org.apache.spark.sql.types.IntegerType,
      "a string source column must not change the int target's type")
  }

  test("float→double widens alongside an added column in one evolving merge") {
    val (cat, wh) = fresh("both")
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, r FLOAT) TBLPROPERTIES ('key'='k')")
    spark.sql(s"INSERT INTO $cat.t VALUES (1, CAST(1.5 AS FLOAT))")
    spark.sql(
      "SELECT * FROM VALUES (1L, CAST(2.25 AS DOUBLE), 'new') AS s(k, r, tag)")
      .createOrReplaceTempView("mw_both_src")
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.t t USING mw_both_src s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    val sch = Versioned.snapshot(spark, s"$wh/t").physicalSchema.get
    assert(sch("r").dataType == org.apache.spark.sql.types.DoubleType)
    assert(sch.fieldNames.contains("tag"))
    val row = spark.sql(s"SELECT r, tag FROM $cat.t WHERE k = 1").head()
    assert(row.getDouble(0) == 2.25 && row.getString(1) == "new")
  }
}
