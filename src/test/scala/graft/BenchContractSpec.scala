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

  test("short query codes (zero-stripped prefix before first '_') are unique") {
    val codes = names.map(Bench.shortCode)
    val dups = codes.groupBy(identity).collect { case (c, g) if g.size > 1 => c }
    assert(dups.isEmpty, s"duplicate short codes: ${dups.mkString(",")}")
  }

  test("compact line fits the tail at the CURRENT suite size; omission bounded") {
    // worst realistic widths: every median just under the 10 s format
    // breakpoint (3-char "9.9")
    val line = Bench.compactLine(names.map(_ -> 9.9), Seq.empty, "sf0.1")
    assert(line.length < tailBudget,
      s"bench line ${line.length} chars risks truncation at ${names.size} queries")
    // the channel degrades by dropping the FASTEST queries (pinned in
    // the slowest-kept test below); the per-query signal is gutted only
    // if omission grows past the noise-dominated tail — cap it hard so
    // suite growth forces a width rethink before visibility erodes
    val omitted = """"omitted":(\d+)""".r.findFirstMatchIn(line)
      .map(_.group(1).toInt).getOrElse(0)
    assert(omitted <= 20,
      s"$omitted of ${names.size} queries omitted at worst-case widths — " +
        "densify the encoding (line is " + line.length + " chars)")
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
    assert(line.length <= 1905)
    (1 to 5).foreach { i =>
      assert(line.contains(s""""q$i":60"""), s"slow query q$i dropped: $line")
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
    assert(bad.contains(""""errors":["q2"]"""))
  }

  test("every oracleSql key has a queries entry") {
    val orphans = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(orphans.isEmpty, s"oracle without query: ${orphans.mkString(",")}")
  }
}
