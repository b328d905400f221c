package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Guards the bench harness's quiet-reference parser. The round-9
  * driver artifact embedded ~19 s of scheduler noise because the retry
  * guard's exact-substring tag match (`"queries":{`) silently parsed a
  * reserialized reference (`"queries": {` — one space) to an EMPTY map
  * and disarmed itself with no diagnostic. These tests pin the
  * whitespace-tolerant parse so the guard can never be disarmed by a
  * formatting change again.
  */
class BenchSpec extends AnyFunSuite with Matchers {

  private val compact =
    """{"metric":"total","value":1.0,"unit":"sec","queries":{"q01":0.12,"q02":1.5e-1},"errors":{},"sf":"x"}"""

  // exactly the round-9 failure shape: space after the key's colon,
  // spaces inside the pairs, newlines between entries
  private val spaced =
    "{\"metric\": \"total\", \"value\": 1.0, \"queries\": {\n  \"q01\": 0.12,\n  \"q02\": 0.15\n}, \"errors\": {}}"

  test("parseQueryMap reads Bench's own compact serialization") {
    val m = Bench.parseQueryMap(compact)
    m should have size 2
    m("q01") shouldBe 0.12 +- 1e-9
    m("q02") shouldBe 0.15 +- 1e-9
  }

  test("parseQueryMap survives external re-serialization with whitespace") {
    val m = Bench.parseQueryMap(spaced)
    m should have size 2
    m("q01") shouldBe 0.12 +- 1e-9
    m("q02") shouldBe 0.15 +- 1e-9
  }

  test("jsonObj extracts the right object even with spaced tags") {
    Bench.jsonObj(spaced, "queries") should include ("\"q01\"")
    Bench.jsonObj(spaced, "errors").trim shouldBe ""
    Bench.jsonObj(spaced, "absent") shouldBe ""
  }

  test("jsonObj skips braces inside quoted strings") {
    val s = """{"errors":{"q9":"boom {not a brace}"},"queries":{"q1":2.0}}"""
    Bench.parseQueryMap(s) shouldBe Map("q1" -> 2.0)
    Bench.jsonObj(s, "errors") should include ("boom")
  }

  test("jsonObj ignores a tag lookalike inside a string value") {
    // an error VALUE quoting an artifact line must not hijack the
    // extraction when keys are reordered ('errors' before 'queries')
    val s = """{"errors":{"q9":"failed parsing \"queries\":{\"q0\":9.9}"},"queries":{"q1":2.0}}"""
    Bench.parseQueryMap(s) shouldBe Map("q1" -> 2.0)
  }

  test("first_call stitches through the artifact like any query map") {
    // the build-inclusive first-call map rides the same serializer and
    // parser as queries/retried — one shape, one guard
    val s =
      """{"metric":"total","value":9.0,"queries":{"q33":0.4},"first_call":{"q33":6.25},"errors":{}}"""
    Bench.parseQueryMap(
      s"""{"queries":{${Bench.jsonObj(s, "first_call")}}}""") shouldBe
      Map("q33" -> 6.25)
  }

  test("the committed bench artifact records first_call for every pinned query") {
    // VERDICT r14 #3: buildOnFirstCall pins index/state builds outside
    // the min-of-runs, so build-cost drift was invisible — the artifact
    // must now carry a build-inclusive first_call reading for every
    // pinned query it timed
    val p = java.nio.file.Paths.get("bench.json")
    assume(java.nio.file.Files.exists(p))
    val line = new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8)
    val timed = Bench.parseQueryMap(line).keySet
    assume(timed.size > 100) // a full-suite artifact, not a filtered run
    val fc = Bench.parseQueryMap(
      s"""{"queries":{${Bench.jsonObj(line, "first_call")}}}""")
    val expected = SparkEntry.buildOnFirstCall.intersect(timed)
    fc.keySet shouldBe expected
    all(fc.values) should be >= 0.0
    // build-inclusive by construction: never below the warm min
    val warm = Bench.parseQueryMap(line)
    fc.foreach { case (k, v) => v should be >= warm(k) * 0.999 }
  }

  test("the committed quiet reference parses to a non-empty map") {
    val p = java.nio.file.Paths.get("bench_quiet.json")
    assume(java.nio.file.Files.exists(p))
    val line = new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8)
    val m = Bench.parseQueryMap(line)
    m.size should be > 100 // 163 queries as of round 9
    all(m.values) should be >= 0.0
  }
}
