package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the documented query counts to the code so they cannot drift
  * (r8 verdict: README said 255 while the tree had 258). Pure file
  * checks — no SparkSession. */
class CoverageDocSpec extends AnyFunSuite {

  private def firstInt(path: String, pattern: String): Int = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try {
      val re = pattern.r
      re.findFirstMatchIn(src.mkString)
        .getOrElse(fail(s"$path: no match for $pattern"))
        .group(1).toInt
    } finally src.close()
  }

  test("README and COVERAGE query counts equal SparkEntry.queries.size") {
    val n = SparkEntry.queries.size
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet ||
      SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet),
      "every oracle needs a query")
    assert(firstInt("README.md",
      """SparkEntry\.queries: (\d+) named queries""") == n,
      s"README count must be $n")
    assert(firstInt("COVERAGE.md", """(\d+) queries total""") == n,
      s"COVERAGE count must be $n")
  }
}
