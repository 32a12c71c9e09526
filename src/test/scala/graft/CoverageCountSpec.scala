package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** The registry counts documented in COVERAGE.md and README.md must equal
  * the code's actual counts — two rounds running, the prose headers went
  * stale the moment a late query landed, so the numbers are now derived
  * mechanically: this spec fails the build whenever the docs and
  * `SparkEntry.queries`/`oracleSql` disagree. */
class CoverageCountSpec extends AnyFunSuite {

  private def read(p: String): String =
    new String(Files.readAllBytes(Paths.get(p)), java.nio.charset.StandardCharsets.UTF_8)

  test("COVERAGE.md header counts match the registry") {
    val total = SparkEntry.queries.size
    val oracled = SparkEntry.oracleSql.size
    val rowsOnly = total - oracled
    val head = read("COVERAGE.md")
    assert(head.contains(s"Query registry: $total entries"),
      s"COVERAGE.md total stale: registry has $total entries")
    assert(head.contains(s"($oracled hash-verified"),
      s"COVERAGE.md oracled count stale: $oracled queries carry oracles")
    assert(head.contains(s"the $rowsOnly rows-only"),
      s"COVERAGE.md rows-only count stale: $rowsOnly queries lack oracles")
  }

  test("README.md oracled-query claim matches the registry") {
    assert(read("README.md").contains(
      s"All ${SparkEntry.oracleSql.size} oracled queries match"),
      s"README.md stale: ${SparkEntry.oracleSql.size} oracled queries")
  }

  test("every oracle key names a registered query") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracles without queries: $unknown")
  }
}
