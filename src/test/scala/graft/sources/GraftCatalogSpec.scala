package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins for [[GraftCatalog]] — the DSv2 pure-SQL lifecycle:
  * CREATE/INSERT/INSERT OVERWRITE/SELECT/time travel/DROP against
  * versioned tables, with every write riding the commit protocol
  * (versions mint, CHECK constraints apply, the key property pins the
  * clustered layout). */
class GraftCatalogSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.cgraft", "graft.sources.GraftCatalog")
    s.conf.set("spark.sql.catalog.cgraft.warehouse",
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get("target", "cgraft_wh")).toString)
    s
  }
  import spark.implicits._

  private def uniq(tag: String): String =
    tag + "_" + java.util.UUID.randomUUID().toString.replace("-", "").take(10)

  test("CREATE/INSERT/SELECT/DROP round-trip; appends mint versions") {
    val t = uniq("t")
    spark.sql(s"CREATE TABLE cgraft.$t (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('key' = 'k')")
    spark.sql(s"INSERT INTO cgraft.$t VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"INSERT INTO cgraft.$t VALUES (3, 'c')")
    assert(spark.sql(s"SELECT k, v FROM cgraft.$t ORDER BY k")
      .as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // the catalog path IS a plain versioned table: create + 2 appends
    val path = s"target/cgraft_wh/$t"
    assert(Versioned.latestVersion(spark, path) == 3L)
    assert(Versioned.snapshot(spark, path).statsCol.contains("k"),
      "TBLPROPERTIES('key') pinned the commit key")
    assert(spark.sql(s"SHOW TABLES IN cgraft").collect()
      .map(_.getString(1)).contains(t))
    spark.sql(s"DROP TABLE cgraft.$t")
    assert(!spark.catalog.tableExists(s"cgraft.$t"))
  }

  test("VERSION AS OF time-travels; INSERT OVERWRITE replaces") {
    val t = uniq("tt")
    spark.sql(s"CREATE TABLE cgraft.$t (k BIGINT) TBLPROPERTIES ('key'='k')")
    spark.sql(s"INSERT INTO cgraft.$t VALUES (1), (2), (3)")
    spark.sql(s"INSERT OVERWRITE cgraft.$t VALUES (9)")
    assert(spark.sql(s"SELECT count(*) FROM cgraft.$t").as[Long].head() == 1L)
    assert(spark.sql(s"SELECT count(*) FROM cgraft.$t VERSION AS OF 2")
      .as[Long].head() == 3L, "the pre-overwrite snapshot stays readable")
    assert(spark.sql(s"SELECT k FROM cgraft.$t VERSION AS OF 3")
      .as[Long].head() == 9L)
  }

  test("writes through the catalog pass the commit gates (CHECK constraints)") {
    val t = uniq("tc")
    spark.sql(s"CREATE TABLE cgraft.$t (k BIGINT) TBLPROPERTIES ('key'='k')")
    Versioned.addCheckConstraint(spark, s"target/cgraft_wh/$t",
      "k_pos", "k > 0")
    spark.sql(s"INSERT INTO cgraft.$t VALUES (5)")
    val e = intercept[Exception](
      spark.sql(s"INSERT INTO cgraft.$t VALUES (-1)"))
    assert(e.getMessage.contains("k_pos"),
      s"constraint violation surfaces through SQL: ${e.getMessage.take(120)}")
    assert(spark.sql(s"SELECT count(*) FROM cgraft.$t").as[Long].head() == 1L,
      "the violating insert committed nothing")
  }
}
