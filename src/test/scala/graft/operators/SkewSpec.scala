package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Tables

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("salted join is result-identical to the plain equi-join") {
    val fact = Tables.lineitem(spark, TestSpark.sf)
      .select("l_orderkey", "l_extendedprice")
    val dim = Tables.orders(spark, TestSpark.sf)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
    val salted = Skew.saltedJoin(fact, dim, "l_orderkey", salts = 8)
      .groupBy("o_orderstatus").agg(count(lit(1)).as("cnt"),
        round(sum("l_extendedprice"), 2).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val plain = fact.join(dim, "l_orderkey")
      .groupBy("o_orderstatus").agg(count(lit(1)).as("cnt"),
        round(sum("l_extendedprice"), 2).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(salted.toSeq == plain.toSeq)
  }

  test("salt values spread rows of a single hot key across sub-keys") {
    import spark.implicits._
    val hot = Seq.fill(1000)(("k", 1.0)).toDF("k", "v")
    val salted = hot.withColumn("__salt", pmod(xxhash64(col("k"), col("v")), lit(8L)))
    // hashing the whole row of identical rows gives ONE salt — spread
    // requires row distinguishers; with a row number it spreads fully
    val withId = hot.withColumn("rid", monotonically_increasing_id())
    val spread = withId.withColumn("__salt",
      pmod(xxhash64(col("k"), col("rid")), lit(8L)))
      .select("__salt").distinct().count()
    assert(spread == 8, s"expected all 8 salts used, got $spread")
    assert(salted.select("__salt").distinct().count() >= 1)
  }
}
