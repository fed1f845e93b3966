package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test JVM (Test / fork := true,
  * so this never collides with a driver run). */
object TestSpark {
  lazy val spark: SparkSession = Sessions.local("4")
  val sf: String = "/root/testdata/sf0.001"
}
