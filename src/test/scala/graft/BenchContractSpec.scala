package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract guards for the bench artifact: the stdout JSON line
  * must survive the driver's 2000-char output tail (with sbt's trailing
  * "[success] ..." line in the same window), and the short query codes
  * it reports must stay unique. Pure map inspection — no Spark session.
  */
class BenchContractSpec extends AnyFunSuite {

  private lazy val names = SparkEntry.queries.keySet.toSeq.sorted

  test("short query codes (prefix before first '_') are unique") {
    val codes = names.map(_.takeWhile(_ != '_'))
    val dups = codes.groupBy(identity).collect { case (c, g) if g.size > 1 => c }
    assert(dups.isEmpty, s"duplicate short codes: ${dups.mkString(",")}")
  }

  test("worst-case compact bench line fits the driver's 2000-char tail") {
    // mirror Bench.scala's line with worst-case widths: the adaptive
    // formatter (thresholds at the rounding boundaries 9.995/99.95)
    // bounds every median at 4 chars ("9.99" / "99.9" / "9999")
    val qs = names.map(n => "\"" + n.takeWhile(_ != '_') + "\":9.99")
      .mkString("{", ",", "}")
    val line = s"""{"metric":"total","value":99999.999,"unit":"sec","queries":$qs,""" +
      s""""errors":{},"sf":"sf0.1"}"""
    val tailBudget = 2000 - 80 // leave room for sbt's "[success] ..." line
    assert(line.length < tailBudget,
      s"bench line ${line.length} chars risks truncation at ${names.size} queries")
  }

  test("every oracleSql key has a queries entry") {
    val orphans = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(orphans.isEmpty, s"oracle without query: ${orphans.mkString(",")}")
  }
}
