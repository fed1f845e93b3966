package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract guards for the bench artifact: the stdout JSON line
  * must survive the driver's 2000-char output tail (with sbt's trailing
  * "[success] ..." line in the same window), and the short query codes
  * it reports must stay unique. Drives Bench.compactLine directly —
  * pure function, no Spark session.
  */
class BenchContractSpec extends AnyFunSuite {

  private lazy val names = SparkEntry.queries.keySet.toSeq.sorted
  // the driver captures ~2000 chars; sbt's "[success] Total time: ..."
  // line (~75 chars) shares the window
  private val tailBudget = 2000 - 80

  test("short query codes (prefix before first '_') are unique") {
    val codes = names.map(_.takeWhile(_ != '_'))
    val dups = codes.groupBy(identity).collect { case (c, g) if g.size > 1 => c }
    assert(dups.isEmpty, s"duplicate short codes: ${dups.mkString(",")}")
  }

  test("compact line fits the tail at the CURRENT suite size with no omission") {
    // worst realistic widths: every median just under the 10 s format
    // breakpoint (3-char "9.9")
    val line = Bench.compactLine(names.map(_ -> 9.9), Seq.empty, "sf0.1")
    assert(line.length < tailBudget,
      s"bench line ${line.length} chars risks truncation at ${names.size} queries")
    assert(!line.contains("\"omitted\""),
      s"current ${names.size}-query suite must fit without omission")
  }

  test("compact line NEVER outgrows the tail — pinned at 220 queries") {
    // a future suite: 220 queries with worst-case 4-char codes and
    // values, plus errors — the builder must degrade by omission, not
    // overflow
    val future = (1 to 220).map(i => f"sx$i%03d_future_query" -> 99.4)
    val line = Bench.compactLine(future, Seq("sx001_future_query"), "sf0.1")
    assert(line.length < tailBudget, s"line ${line.length} chars at 220 queries")
    assert(line.contains("\"omitted\":"), "over-budget suite must declare omission")
    assert(line.startsWith("""{"metric":"total","value":"""))
  }

  test("omission keeps the slowest queries (the performance signal)") {
    val many = (1 to 300).map(i => f"q$i%03d_x" -> (if (i <= 5) 60.0 else 0.1))
    val line = Bench.compactLine(many, Seq.empty, "sf0.1")
    assert(line.length <= 1880)
    (1 to 5).foreach { i =>
      assert(line.contains(f""""q$i%03d":60"""), s"slow query q$i%03d dropped: $line")
    }
  }

  test("a mass-failure run still fits the tail (bounded error list)") {
    val names = (1 to 300).map(i => f"q$i%03d_x")
    val line = Bench.compactLine(names.map(_ -> 9.9), names, "sf0.1")
    assert(line.length < tailBudget,
      s"all-failing 300-query run must stay parseable, got ${line.length}")
    assert(line.contains("\"errors_omitted\":276"))
  }

  test("empty error list emits no errors key; failures list codes") {
    val ok = Bench.compactLine(Seq("q01_a" -> 1.0), Seq.empty, "sf0.1")
    assert(!ok.contains("errors"))
    val bad = Bench.compactLine(Seq("q01_a" -> 1.0), Seq("q02_b_failed"), "sf0.1")
    assert(bad.contains(""""errors":["q02"]"""))
  }

  test("every oracleSql key has a queries entry") {
    val orphans = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(orphans.isEmpty, s"oracle without query: ${orphans.mkString(",")}")
  }
}
