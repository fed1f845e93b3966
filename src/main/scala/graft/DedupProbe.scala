package graft

import org.apache.spark.sql.functions._

/** Scratch attribution probe for the d04 prefix-filter pipeline (r17
  * optimization round): times the checkpoint materialization vs the
  * candidate join vs the verify separately. */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import graft.dedup.Dedup
    import graft.sources.Tables
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, d)
    (1 to 3).foreach { rep =>
      var t0 = System.nanoTime()
      def lap(tag: String): Unit = {
        println(f"[probe] rep $rep $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        t0 = System.nanoTime()
      }
      val docsh = Dedup.withHashedShingleArray(
        docs.select(col("doc_id").as("id"), col("lang").as("blk"), col("text")),
        "text", 3, "shs", "hs")
        .select("id", "blk", "shs", "hs")
        .localCheckpoint(true)
      lap("docsh checkpoint")
      val sh = docsh
        .select(col("id"), col("blk"), size(col("shs")).as("cnt"), col("shs"))
        .withColumn("sh", explode_outer(col("shs"))).filter(col("sh").isNotNull).drop("shs")
      val ranked = sh
        .withColumn("df", count(lit(1)).over(Window.partitionBy("blk", "sh")))
        .withColumn("pos",
          row_number().over(Window.partitionBy("id").orderBy(col("df"), col("sh"))))
      val prefix = ranked
        .filter(col("pos") <= col("cnt") - ceil(lit(0.5) * col("cnt")).cast("long") + 1)
        .select(col("blk"), col("sh"), col("id"))
        .localCheckpoint(true)
      lap("prefix checkpoint")
      val candsL = prefix.select(col("blk"), col("sh"), col("id").as("da"))
        .join(prefix.select(col("blk"), col("sh"), col("id").as("db")), Seq("blk", "sh"))
        .filter(col("da") < col("db"))
        .select("da", "db")
      val cands = candsL.distinct().localCheckpoint(true)
      lap("cands ckpt")
      // ppjoin positional-filter leg (r18): same prefix join, but each
      // side carries (pos, cnt); per shared prefix token the overlap is
      // bounded by min(pa-1,pb-1) + min(ca-pa,cb-pb) + 1, and the pair
      // needs overlap >= t/(1+t)*(ca+cb) to reach Jaccard >= t. The
      // groupBy takes the MIN bound over shared tokens (every token's
      // bound is valid), so the filter is lossless by construction.
      val t05 = 0.5
      val pp = ranked
        .filter(col("pos") <= col("cnt") - ceil(lit(t05) * col("cnt")).cast("long") + 1)
        .select(col("blk"), col("sh"), col("id"), col("pos"), col("cnt"))
        .localCheckpoint(true)
      val candsPos = pp.select(col("blk"), col("sh"), col("id").as("da"),
          col("pos").as("pa"), col("cnt").as("ca"))
        .join(pp.select(col("blk"), col("sh"), col("id").as("db"),
          col("pos").as("pb"), col("cnt").as("cb")), Seq("blk", "sh"))
        .filter(col("da") < col("db"))
        .groupBy("da", "db")
        .agg(min(least(col("pa") - 1, col("pb") - 1) +
          least(col("ca") - col("pa"), col("cb") - col("pb")) + 1).as("ub"),
          max(col("ca") + col("cb")).as("sc"))
        .filter(col("ub").cast("double") * (1.0 + t05) >= lit(t05) * col("sc") - 1e-6)
        .select("da", "db")
        .localCheckpoint(true)
      lap("candsPos ckpt")
      if (rep == 1) println(s"[probe] candsPos=${candsPos.count()}")
      val outPos = Dedup.jaccardVerifyArrays(candsPos, docsh.select("id", "shs", "hs"))
        .filter(col("jaccard") >= 0.5)
      outPos.write.format("noop").mode("overwrite").save()
      lap("verify+noop (positional cands)")
      if (rep == 1) {
        println(s"[probe] counts: docs=${docsh.count()} prefixRows=${prefix.count()} " +
          s"cands=${cands.count()} avgShingles=" +
          docsh.select(avg(size(col("shs")))).head().getDouble(0).round)
        t0 = System.nanoTime()
      }
      val out = Dedup.jaccardVerifyArrays(cands, docsh.select("id", "shs", "hs"))
        .filter(col("jaccard") >= 0.5)
      out.write.format("noop").mode("overwrite").save()
      lap("verify+noop (ckpt cands)")
      val arr = docsh.select(col("id"), col("shs"), col("hs"))
      val joinOnly = cands.join(arr.as("A"), col("da") === col("A.id"))
        .join(arr.as("B"), col("db") === col("B.id"))
        .select(col("da"), col("db"))
      joinOnly.write.format("noop").mode("overwrite").save()
      lap("join-only noop")
      val joinArrs = cands.join(arr.as("A"), col("da") === col("A.id"))
        .join(arr.as("B"), col("db") === col("B.id"))
        .select(col("da"), col("db"), col("A.shs"), col("B.shs"))
      joinArrs.write.format("noop").mode("overwrite").save()
      lap("join+arrays noop")
      val ix = cands.join(arr.as("A"), col("da") === col("A.id"))
        .join(arr.as("B"), col("db") === col("B.id"))
        .select(col("da"), col("db"),
          size(array_intersect(col("A.shs"), col("B.shs"))).as("ix"))
      ix.write.format("noop").mode("overwrite").save()
      lap("join+intersect noop")
      // r18 isolation legs: aggregate-only sinks so row width can't
      // confound; each leg evaluates its expression exactly once/pair
      def joined = cands.join(arr.as("A"), col("da") === col("A.id"))
        .join(arr.as("B"), col("db") === col("B.id"))
      joined.agg(sum(size(col("A.shs")) + size(col("B.shs")))).head()
      lap("agg sizes (array access floor)")
      joined.agg(sum(graft.functions.hashed_overlap_count(
        col("A.hs"), col("A.shs"), col("B.hs"), col("B.shs")))).head()
      lap("agg hashed-merge-overlap")
      joined.agg(sum(size(array_intersect(col("A.shs"), col("B.shs"))))).head()
      lap("agg array_intersect")
      val out2 = Dedup.jaccardVerifyArrays(candsL.distinct(), docsh.select("id", "shs", "hs"))
        .filter(col("jaccard") >= 0.5)
        .select(col("da"), col("db"), round(col("jaccard"), 4).as("jac"))
        .orderBy("da", "db")
      out2.write.format("noop").mode("overwrite").save()
      lap("verify+noop (inline cands, query shape)")
    }
    spark.stop()
  }
}
