package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

class SketchesSpec extends SparkSpec {

  test("approx_count_distinct within rsd of exact at every setting") {
    val r = Sketches.distinctCounts(tables.lineitem).collect()(0)
    val exact = r.getAs[Long]("exact_distinct").toDouble
    exact shouldBe 200.0
    // 5 sigma of the advertised relative standard deviation
    math.abs(r.getAs[Long]("approx_rsd05") - exact) / exact should be < 0.25
    math.abs(r.getAs[Long]("approx_rsd10") - exact) / exact should be < 0.5
    math.abs(r.getAs[Long]("approx_rsd01") - exact) / exact should be < 0.05
  }

  test("bloom filter: no false negatives, probes answer") {
    val r = Sketches.bloomMembership(spark, tables.lineitem, "l_returnflag",
      Seq("A", "N", "R", "X", "Z")).collect()
      .map(x => x.getAs[String]("candidate") -> x.getAs[Boolean]("might_contain"))
      .toMap
    r("A") shouldBe true
    r("N") shouldBe true
    r("R") shouldBe true // present keys can never read false
  }

  test("count-min sketch over-counts, never under-counts") {
    val est = Sketches.cmsFrequencies(spark, tables.lineitem, "l_returnflag",
      Seq("A", "N", "R")).collect()
      .map(x => x.getAs[String]("key") -> x.getAs[Long]("estimate")).toMap
    val exact = Sketches.exactFrequencies(tables.lineitem, "l_returnflag",
      Seq("A", "N", "R")).collect()
      .map(x => x.getAs[String]("key") -> x.getAs[Long]("cnt")).toMap
    exact shouldBe Map("A" -> 1962L, "N" -> 2070L, "R" -> 1968L)
    est.keySet shouldBe exact.keySet
    est.foreach { case (k, e) =>
      e should be >= exact(k)
      // eps=0.01 -> overshoot bounded by eps * stream length
      e should be <= exact(k) + (0.01 * 6000).toLong + 1
    }
  }
}
