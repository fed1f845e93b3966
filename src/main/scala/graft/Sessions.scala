package graft

import org.apache.spark.sql.SparkSession

/** Canonical SparkSession factory for graft entry points and tests.
  *
  * Tuned for the harness environment (single-JVM `local[N]`) but with the
  * settings that matter at cluster scale: AQE on (runtime coalescing, skew
  * join splitting), shuffle partitions sized to the parallelism rather than
  * the 200 default, and UTC session time so timestamp-derived results are
  * environment-independent.
  */
object Sessions {
  def local(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName("graft")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // events.ts is parquet TIMESTAMP(MICROS, NTZ); with the session
      // pinned to UTC the Tables.events cast to TimestampType is
      // instant-preserving and oracle comparisons are tz-independent.
      .config("spark.sql.session.timeZone", "UTC")
      // catalog tables (bucketed layouts etc.) land under target/, not
      // the repo root; static conf, so set at builder time
      .config("spark.sql.warehouse.dir", "target/warehouse")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
