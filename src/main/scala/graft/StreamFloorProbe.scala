package graft

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Micro-batch floor profiler for the streaming gate family: runs the
  * st1 replay shape (1 file per trigger + sentinel + trailing no-data
  * flush) twice and prints each batch's `durationMs` breakdown from
  * the progress listener (triggerExecution = total; queryPlanning /
  * getBatch / latestOffset / addBatch / walCommit / commitOffsets are
  * the candidate shared floors). Pass 1 carries JIT + stream-machinery
  * warmup; pass 2 is the steady-state floor the bench medians see.
  *
  * Usage: `sbt "runMain graft.StreamFloorProbe [sfDir] [k=v ...]"` —
  * trailing key=value args are set on the streaming session conf, so
  * floor hypotheses (codegen off, state-store knobs) are one-flag
  * experiments.
  */
object StreamFloorProbe {
  def main(args: Array[String]): Unit = {
    // a first argument is a conf override (not the sfDir) only when it
    // looks like one: contains '=' AND no path separator — Spark-style
    // partition dirs (`/data/scale=0.1`) keep parsing as the sfDir,
    // while the documented `runMain ... spark.x=y` one-flag experiment
    // works without an explicit sfDir
    def isConf(a: String): Boolean = a.contains("=") && !a.contains("/")
    val sfDir = args.headOption.filterNot(isConf)
      .getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local()
    val ss = graft.streaming.Events.streamingSession(spark)
    args.filter(isConf).foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      ss.conf.set(k, v)
      println(s"[floor] conf $k=$v")
    }
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.sql.streaming.StreamingQueryProgress]()
    ss.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        { buf.add(e.progress); () }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    import graft.streaming.Events
    import scala.jdk.CollectionConverters._
    val dir = Events.replayDir(ss, sfDir, sentinels = 1)
    (1 to 2).foreach { pass =>
      buf.clear()
      val t0 = System.nanoTime()
      val ev = Events.readStream(ss, dir, maxFilesPerTrigger = 1)
        .withWatermark("ts", "10 minutes")
      Events.runToTable(ss, Events.tumblingCounts(ev), "append",
        s"floorprobe$pass").count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(800) // listener bus drain
      println(f"[floor] pass $pass wall=$wall%.2f s batches=${buf.size}")
      buf.asScala.zipWithIndex.foreach { case (p, i) =>
        val d = p.durationMs.asScala.toSeq.sortBy(-_._2)
          .map { case (k, v) => s"$k=$v" }.mkString(" ")
        println(s"[floor]   batch $i rows=${p.numInputRows} $d")
      }
    }
    spark.stop()
  }
}
