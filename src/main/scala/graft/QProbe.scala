package graft

/** Targeted per-query timing probe: `runMain graft.QProbe <name>[,<name>...]`
  * warms each query at sf0.001 then times 3 reps at SPARK_GRAFT_SF_DIR
  * (default sf0.1) in the shipped Sessions.local config — the quick loop
  * for optimizing one operator without a full Bench pass. */
object QProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = args(0).split(",").toSeq
    names.foreach(n => SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save())
    (1 to 3).foreach { i =>
      names.foreach { n =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, d).write.format("noop").mode("overwrite").save()
        println(f"$n rep $i: ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
