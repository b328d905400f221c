package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  // a deliberately skewed frame: one hot key with 10k rows, 50 cold keys
  private lazy val skewed = (
    Seq.fill(10000)("hot") ++ (1 to 50).map(i => s"cold_$i")
  ).zipWithIndex.map { case (k, i) => (k, i.toLong) }
    .toDF("key", "value")

  test("saltedSumCount equals the direct aggregation") {
    val salted = Skew.saltedSumCount(skewed, "key", "value")
    val direct = skewed.groupBy("key")
      .agg(sum("value").as("sum_value"), count(lit(1)).as("cnt"))
    rowSet(salted) shouldBe rowSet(direct)
  }

  test("salted phase-1 spreads the hot key over many buffers") {
    val phase1 = skewed
      .withColumn("_salt", pmod(xxhash64(col("value")), lit(16L)).cast("int"))
      .groupBy("key", "_salt").count()
    // hot key occupies (nearly) all 16 salt buckets instead of one buffer
    phase1.filter(col("key") === "hot").count() should be >= 15L
  }

  test("saltedJoin equals the plain shuffle join") {
    val dim = (Seq("hot") ++ (1 to 50).map(i => s"cold_$i"))
      .zipWithIndex.map { case (k, i) => (k, s"name_$i") }
      .toDF("k", "name")
    val salted = Skew.saltedJoin(skewed, dim, "key", "k")
      .select("key", "value", "name")
    val plain = skewed.join(dim, col("key") === col("k"))
      .select("key", "value", "name")
    salted.count() shouldBe plain.count()
    rowSet(salted) shouldBe rowSet(plain)
  }
}
