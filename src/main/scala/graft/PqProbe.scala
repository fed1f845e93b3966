package graft

import org.apache.spark.sql.functions._

/** Scratch attribution probe for the s12 IVF-PQ build+serve pipeline
  * (r17 optimization round). */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import graft.vector.{Ivf, Pq}
    import graft.sources.Tables
    val e = Tables.embeddings(spark, d)
    println(s"[probe] n=${e.count()} dim=" +
      e.select(size(col("embedding"))).head().getInt(0))
    (1 to 3).foreach { rep =>
      var t0 = System.nanoTime()
      def lap(tag: String): Unit = {
        println(f"[probe] rep $rep $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        t0 = System.nanoTime()
      }
      val cents = Ivf.centroids(e, "vec_id", "embedding", k = 16)
      lap("centroids")
      val assigned = Ivf.assign(e, "vec_id", "embedding", cents)
      assigned.write.format("noop").mode("overwrite").save()
      lap("assign noop")
      val books = Pq.codebooks(e, "vec_id", "embedding", m = 8, k = 16)
      lap("codebooks")
      val codes = Pq.encode(e, "vec_id", "embedding", books, m = 8)
      codes.write.format("noop").mode("overwrite").save()
      lap("encode noop")
      val probeDf = e.orderBy("vec_id").limit(1).select(col("embedding"))
      val out = Pq.searchIvfPq(e, assigned, cents, codes, books, "vec_id",
        "embedding", probeDf, "embedding", m = 8, k = 10, nProbe = 4, pool = 50)
      out.write.format("noop").mode("overwrite").save()
      lap("searchIvfPq noop (recomputes assign+encode in-plan)")
    }
    spark.stop()
  }
}
