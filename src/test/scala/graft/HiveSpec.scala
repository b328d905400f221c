package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.core.Sessions
import graft.sources.Sinks

/** S11 deep form: the Hive-metastore-backed catalog
  * (`303-spark-sql/README.md:46-73`) — create a database, persist
  * managed and partitioned+bucketed tables through it, read them back.
  *
  * Runs in its OWN forked JVM (build.sbt testGrouping): the catalog
  * implementation is fixed per-JVM at first SparkSession creation, and
  * every other suite shares an in-memory-catalog session.
  */
class HiveSpec extends AnyFunSuite with Matchers {

  test("hive catalog: database + managed/bucketed table round trip") {
    val spark = Sessions.local("graft-hive-test", cores = 4,
      shufflePartitions = 4, hive = true)
    try {
      import spark.implicits._
      spark.conf.get("spark.sql.catalogImplementation") shouldBe "hive"

      spark.sql("CREATE DATABASE IF NOT EXISTS graft_db")
      spark.sql("SHOW DATABASES").as[String].collect() should
        contain("graft_db")

      val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "a", 3.5))
        .toDF("id", "tag", "v")
      Sinks.saveTable(df, "graft_db.plain")
      spark.table("graft_db.plain").count() shouldBe 3

      Sinks.saveTablePartitioned(df, "graft_db.bucketed",
        partitionBy = Seq("tag"),
        bucketBy = Some((2, Seq("id"))), sortBy = Seq("id"))
      val back = spark.table("graft_db.bucketed")
      back.count() shouldBe 3
      // partition + bucket spec survive the metastore round trip
      val ddl = spark.sql("SHOW CREATE TABLE graft_db.bucketed")
        .first().getString(0)
      ddl should include("PARTITIONED BY")
      ddl should include("CLUSTERED BY")
      // partition pruning works through the metastore catalog
      back.filter($"tag" === "a").count() shouldBe 2
    } finally spark.stop()
  }
}
