package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Each query is fully materialized through the
  * `noop` sink — a bare `count()` would let Catalyst prune away the very
  * expressions being measured. Failures are reported per query in an
  * `errors` map (never silently recorded as a timing) and make the run
  * exit nonzero.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft-bench-warehouse-${System.nanoTime()}")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""

    // 1-minute system load average, recorded at start and end so a
    // load-polluted artifact self-identifies (the documented box-noise
    // policy: quiet means load < 2.2; a 3.8x excursion on a 3-row ORC
    // round-trip is load, not plans — round-5 postmortem)
    def loadAvg: Double =
      java.lang.management.ManagementFactory
        .getOperatingSystemMXBean.getSystemLoadAverage

    val loadStart = loadAvg

    // warm the session (parquet footer reads, codegen, shuffle machinery)
    // so the first timed query isn't charged for JVM startup
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count().collect()
    } catch { case _: Throwable => () }

    // SPARK_GRAFT_BENCH_ONLY=q36,q48 narrows the run for local iteration
    // (prefix match on query names); unset = the full suite.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.exists(n.startsWith)))
    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // two passes per query, report the min: this box shows ~2x run-to-run
    // variance (GC/load), and min-of-2 is the cheapest stable estimator
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      var best = Double.MaxValue
      try {
        (1 to runs).foreach { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
        }
        timings(name) = best
      } catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
            .linesIterator.take(1).mkString.take(200)
      }
    }
    // Locale.ROOT: the f-interpolator is locale-sensitive and a
    // comma-decimal default locale would emit invalid JSON.
    def sec(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = timings.map { case (k, v) => s"${jstr(k)}:${sec(v)}" }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
      .mkString("{", ",", "}")
    val total = timings.values.sum
    val loadEnd = loadAvg
    val loads = s""""load_start":${sec(loadStart)},"load_end":${sec(loadEnd)}"""
    val full =
      s"""{"metric":"total","value":${sec(total)},"unit":"sec","queries":$qs,"errors":$errs,$loads,"sf":${jstr(sfDir)}}"""
    // The driver reads only the stdout TAIL, and the full per-query map
    // (~4 KB) overflows that window — its head truncates mid-key and the
    // line never parses (BENCH_r02/r03 "parsed": null). So: full JSON goes
    // to a file, and the FINAL stdout line is a compact summary (< 1 KB)
    // with just the slowest 5 queries inline.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench.json")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(outPath),
      (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val slow5 = timings.toSeq.sortBy(-_._2).take(5)
      .map { case (k, v) => s"${jstr(k)}:${sec(v)}" }.mkString("{", ",", "}")
    val summary =
      s"""{"metric":"total","value":${sec(total)},"unit":"sec","n_queries":${timings.size},"n_errors":${errors.size},"slowest":$slow5,$loads,"sf":${jstr(sfDir)},"full":${jstr(outPath)}}"""
    // The summary must be the LAST line of the merged stdout+stderr
    // stream (the driver's tail parser reads the final line): silence
    // remaining log output, stop Spark (its shutdown messages land on
    // stderr BEFORE the println this way), THEN print.
    spark.sparkContext.setLogLevel("ERROR")
    spark.stop()
    println(summary)
    if (errors.nonEmpty) sys.exit(1)
  }
}
