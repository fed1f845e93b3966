package graft

import org.apache.spark.sql.functions._

/** Scratch attribution probe for the versioned-table primitive costs
  * that the ~80-query lakehouse family composes (r18 optimization
  * round): times commit / append / read / MoR delete / compact
  * individually at sf0.1 so per-gate numbers decompose into
  * (primitive floor) x (declared mutation count). */
object VersionedProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import graft.sources.{Tables, Versioned}
    val orders = Tables.orders(spark, d)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    (1 to 3).foreach { rep =>
      val dir = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("target"), "vt_probe").toString
      var t0 = System.nanoTime()
      def lap(tag: String): Unit = {
        println(f"[probe] rep $rep $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        t0 = System.nanoTime()
      }
      Versioned.commit(spark, dir, orders, Some("o_orderkey"), files = 8)
      lap("commit 8 files (150k rows)")
      Versioned.appendCommit(spark, dir,
        orders.filter(col("o_orderkey") % 11 === 0), Some("o_orderkey"), files = 2)
      lap("append 2 files")
      Versioned.read(spark, dir).agg(count(lit(1))).head()
      lap("read + count")
      Versioned.read(spark, dir)
        .groupBy("o_orderstatus").agg(sum("o_totalprice")).collect()
      lap("read + groupBy agg")
      Versioned.deleteMergeOnRead(spark, dir,
        orders.filter(col("o_orderkey") % 13 === 0).select("o_orderkey"),
        "o_orderkey")
      lap("deleteMergeOnRead")
      Versioned.read(spark, dir).agg(count(lit(1))).head()
      lap("read + count (with DV)")
      Versioned.compactCommit(spark, dir, targetFiles = 2)
      lap("compactCommit")
      Versioned.latestVersion(spark, dir)
      lap("latestVersion (metadata only)")
    }
    spark.stop()
  }
}
