package graft

import org.scalatest.funsuite.AnyFunSuite

/** Doc-drift gate (r16 verdict #4): README cited a stale "328-query
  * registry" two rounds after the registry moved on. The registry size
  * has ONE source of truth — `SparkEntry.queries` — and any count the
  * README states must match it, so a stale number fails the suite
  * instead of surviving review.
  */
class DocCountSpec extends AnyFunSuite {

  test("README never states a registry count that disagrees with SparkEntry") {
    val n = SparkEntry.queries.size
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")
    val pats = Seq("""(\d+)-query registry""".r,
      """registry of (\d+) quer""".r, """(\d+) registered quer""".r)
    val stale = pats.flatMap(_.findAllMatchIn(readme).map(_.group(1).toInt))
      .filter(_ != n)
    assert(stale.isEmpty,
      s"README cites registry count(s) $stale but SparkEntry.queries has $n")
  }
}
