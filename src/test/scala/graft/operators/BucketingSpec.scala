package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Tables

/** Co-located joins via bucketing (SURVEY.md "partitioning & shuffle"):
  * two tables bucketed by the join key with equal bucket counts join
  * WITHOUT any shuffle exchange — the 100 TB lever for repeated joins
  * on the same key. Verified on the physical plan, not assumed. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed-by-key tables join with zero shuffle exchanges") {
    // isolated session: broadcast disabled so the join would otherwise
    // need a full shuffle (tables are tiny at test scale)
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.sql("DROP TABLE IF EXISTS li_bucketed")
    s.sql("DROP TABLE IF EXISTS ord_bucketed")
    // the in-memory catalog forgets tables between JVMs but the managed
    // locations persist — clear them or CTAS refuses to reuse the path
    Seq("li_bucketed", "ord_bucketed").foreach { t =>
      val p = java.nio.file.Paths.get("target", "warehouse", t)
      if (java.nio.file.Files.exists(p)) {
        java.nio.file.Files.walk(p)
          .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(f => java.nio.file.Files.deleteIfExists(f))
      }
    }
    Tables.lineitem(s, TestSpark.sf)
      .select("l_orderkey", "l_extendedprice")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    Tables.orders(s, TestSpark.sf)
      .select("o_orderkey", "o_orderstatus")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_bucketed")

    val joined = s.table("li_bucketed")
      .join(s.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("cnt"))
    val rows = joined.collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)

    val plan = joined.queryExecution.executedPlan.toString
    val joinSection = plan.split("HashAggregate").last // below the agg's own exchange
    assert(joinSection.contains("SortMergeJoin") || joinSection.contains("ShuffledHashJoin"))
    assert(!joinSection.contains("Exchange"),
      s"bucketed join must not shuffle; plan:\n$plan")

    // and the result is the plain join's result
    val plain = Tables.lineitem(s, TestSpark.sf)
      .join(Tables.orders(s, TestSpark.sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(rows.toSeq == plain.toSeq)
  }
}
