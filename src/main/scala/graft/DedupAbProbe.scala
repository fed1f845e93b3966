package graft

import org.apache.spark.sql.functions._

/** Interleaved A/B for the r18 shingle-array verify layouts (the
  * r16/r17 box-drift instrument: legs alternate within each rep, so
  * box drift hits both equally and the delta is code-attributable
  * whatever the box is doing).
  *
  * Leg A = the d04 prefix pipeline on PLAIN string arrays with the
  * `array_intersect` verify (the r17 shape); leg B = the shipped
  * `Dedup.ngramJaccardPairs` ((hash, string)-sorted parallel arrays +
  * hash-guided merge).
  *
  * Settled verdicts (sf0.1, 5k docs):
  *  - d04 shape (74k candidate pairs): B wins by ~0.6–0.8 s/run — the
  *    verify's per-pair string materialization dominates.
  *  - d02/minHash shape (collision-sized candidates): hashed creation
  *    COSTS MORE than its verify win (+0.12 s mean over 4 interleaved
  *    reps) — which is why `shingleArrays` stays on plain strings and
  *    only `ngramJaccardPairs` uses the hashed layout. */
object DedupAbProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import org.apache.spark.sql.expressions.Window
    import graft.dedup.Dedup
    import graft.sources.Tables
    val docs = Tables.documents(spark, d)

    def oldLeg(): Unit = {
      // the r17 d04 shape: plain string arrays end to end
      val docsh = Dedup.withShingleArray(
          docs.select(col("doc_id").as("id"), col("lang").as("blk"), col("text")),
          "text", 3, "shs")
        .select("id", "blk", "shs").localCheckpoint(true)
      val sh = docsh
        .select(col("id"), col("blk"), size(col("shs")).as("cnt"), col("shs"))
        .withColumn("sh", explode_outer(col("shs")))
        .filter(col("sh").isNotNull).drop("shs")
      val prefix = sh
        .withColumn("df", count(lit(1)).over(Window.partitionBy("blk", "sh")))
        .withColumn("pos",
          row_number().over(Window.partitionBy("id").orderBy(col("df"), col("sh"))))
        .filter(col("pos") <= col("cnt") - ceil(lit(0.5) * col("cnt")).cast("long") + 1)
        .select(col("blk"), col("sh"), col("id"))
        .localCheckpoint(true)
      val cands = prefix.select(col("blk"), col("sh"), col("id").as("da"))
        .join(prefix.select(col("blk"), col("sh"), col("id").as("db")), Seq("blk", "sh"))
        .filter(col("da") < col("db"))
        .select("da", "db").distinct()
      val arr = docsh.select(col("id"), col("shs"))
      val verified = cands
        .join(arr.as("A"), col("da") === col("A.id"))
        .join(arr.as("B"), col("db") === col("B.id"))
        .select(col("da"), col("db"),
          size(array_intersect(col("A.shs"), col("B.shs"))).cast("long").as("ix"),
          size(col("A.shs")).cast("long").as("na"),
          size(col("B.shs")).cast("long").as("nb"))
        .select(col("da"), col("db"),
          (col("ix").cast("double") / (col("na") + col("nb") - col("ix")))
            .as("jaccard"))
        .localCheckpoint(true)
      verified.filter(col("jaccard") >= 0.5)
        .select(col("da"), col("db"), round(col("jaccard"), 4).as("jac"))
        .orderBy("da", "db")
        .write.format("noop").mode("overwrite").save()
    }

    def newLeg(): Unit =
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", "lang", threshold = 0.5)
        .select(col("da"), col("db"), round(col("jaccard"), 4).as("jac"))
        .orderBy("da", "db")
        .write.format("noop").mode("overwrite").save()

    // warm both legs once
    oldLeg(); newLeg()
    (1 to 4).foreach { rep =>
      var t0 = System.nanoTime()
      oldLeg()
      val a = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      newLeg()
      val b = (System.nanoTime() - t0) / 1e9
      println(f"[ab] rep $rep old=$a%.2f s new=$b%.2f s delta=${b - a}%+.2f s")
    }
    spark.stop()
  }
}
