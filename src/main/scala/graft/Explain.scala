package graft

/** Plan-audit utility: print `explain("formatted")` for one or more
  * SparkEntry queries — the loop behind PLANS.md. Usage:
  * `runMain graft.Explain <name>[,<name>...] [sfDir]`. */
object Explain {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = Sessions.local()
    names.foreach { n =>
      println(s"==== $n ====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
