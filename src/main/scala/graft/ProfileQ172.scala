package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase profiler for q172_corpus_compact — the measurement behind the
  * round-17 adjudication of its apparent +34% driver regression
  * (OPTIMIZATION_r17.md): runs the declared query exactly as Bench does
  * (3 full noop-sink runs, run 1 build-inclusive), then splits a warm
  * round into delta / compactCorpus / ordered-noop phases. Not part of
  * the driver contract; committed, like AbBench, so the recorded
  * numbers stay reproducible.
  */
object ProfileQ172 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft-prof-warehouse-${System.nanoTime()}")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](name: String)(f: => A): A = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // exactly the bench's invocation: the declared query fn, noop sink,
    // three runs (run1 = build-inclusive first call)
    val fn = SparkEntry.queries("q172_corpus_compact")
    (1 to 3).foreach { i =>
      t(s"q172 full run$i") {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
    }

    // then the phase split on the SAME (already-built) state
    val docs = graft.sources.Tables(spark, sfDir).documents
    def dirTag(d: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val p = s"graft_corpus_cstate_${dirTag(sfDir)}"
    val v1Table = s"${p}_v1chunks"
    // crawlV2, verbatim from SparkEntry
    val v2 = docs.filter(col("doc_id") % 17 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 13 === 0,
          concat(col("text"), lit(" edited v2")))
          .otherwise(col("text")))
      .unionByName(
        docs.filter(col("doc_id") % 19 === 0).select(
          (col("doc_id") + 100000L).as("doc_id"), col("text"),
          col("lang"), col("source"), col("n_chars")))
    (1 to 2).foreach { round =>
      println(s"== phase-split round $round ==")
      val delta = t(s"r$round delta (corpusDelta)") {
        graft.operators.Pipeline.corpusDelta(v2, docs, p)
      }
      val folded = graft.operators.Pipeline
        .applyCorpusDelta(spark.table(v1Table), delta)
      t(s"r$round compactCorpus") {
        graft.operators.Pipeline.compactCorpus(folded, p, s"${p}_compacted2")
      }
      t(s"r$round final orderBy noop") {
        spark.table(s"${p}_compacted2").orderBy("doc_id", "chunk_idx")
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
