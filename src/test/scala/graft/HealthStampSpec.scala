package graft

import org.scalatest.funsuite.AnyFunSuite

/** The health stamps are embedded verbatim inside every measurement
  * manifest (Bench envelopes, RouteEval, BuildIndexes/IngestBatch/
  * compact) and parsed downstream by json.load — a malformed fragment
  * would silently break every artifact reader, so the shape is pinned
  * here rather than discovered at adjudication time.
  */
class HealthStampSpec extends AnyFunSuite {

  test("json() is a parseable object with the three stamp fields") {
    val s = HealthStamp.json()
    // Parse with the same strictness a python json.load applies, via
    // Spark's bundled Jackson (no extra dependency).
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(s)
    assert(m.isObject)
    assert(m.has("load") && m.get("load").isArray)
    assert(m.get("load").size() == 3 || m.get("load").size() == 0) // [] off-Linux
    assert(m.has("other_spark_jvms") && m.get("other_spark_jvms").canConvertToLong)
    assert(m.has("fault_us_per_page") && m.get("fault_us_per_page").isNumber)
  }

  test("fault probe returns a positive finite latency") {
    val v = HealthStamp.faultUsPerPage()
    assert(v > 0.0 && v < 1e6 && !v.isNaN)
  }

  test("an sbt-launched run counts zero foreign JVMs for itself") {
    // The suite's own sbt/JVM ancestor chain must be excluded — a
    // constant false positive would flag every idle draw as contended.
    assert(HealthStamp.otherSparkJvms() >= 0L)
  }
}
