package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** URL/domain hygiene for web-scale corpus curation: host extraction,
  * registered-domain rollup, path shape, and blocklist screening — the
  * filters a crawl-derived training set applies before any content-level
  * quality pass (cf. the reference's ingest-then-filter lifecycle,
  * `302-spark-sql-basics/README.md` ingest stage).
  *
  * Everything here is a per-row projection over codegen'd built-ins
  * (`parse_url` / `regexp_extract` / `split`): no shuffle, no UDF, scales
  * linearly with the scan. The only aggregate ([[domainStats]]) groups on
  * the low-cardinality registered domain.
  */
object Web {

  /** Appends `host`, `registered_domain`, `path_depth`, `is_https` parsed
    * from `urlCol`. `parse_url` (java.net.URI semantics) strips ports,
    * userinfo, query, and fragment from HOST/PATH. The registered domain
    * is the last two host labels — a production deployment substitutes a
    * public-suffix list here, which is lookup-table config (a broadcast
    * join against the PSL), not a different plan shape.
    */
  def urlFeatures(df: DataFrame, urlCol: String = "url"): DataFrame = {
    val u = col(urlCol)
    df.withColumn("host", lower(parse_url(u, lit("HOST"))))
      .withColumn("registered_domain",
        regexp_extract(col("host"), "([^.]+[.][^.]+)$", 1))
      .withColumn("path_depth",
        size(filter(split(coalesce(parse_url(u, lit("PATH")), lit("")), "/"),
          s => s =!= "")).cast("long"))
      .withColumn("is_https", u.startsWith("https://"))
  }

  /** [[urlFeatures]] plus a `blocked` flag against a registered-domain
    * blocklist. The list is inlined as a literal `isin` (tens-to-thousands
    * of entries → codegen'd hash-set probe); a list too large to inline
    * becomes a broadcast anti/semi join — same screen, still shuffle-free
    * on the corpus side.
    */
  def domainScreen(docs: DataFrame, blockedDomains: Seq[String],
      urlCol: String = "url"): DataFrame =
    urlFeatures(docs, urlCol)
      .withColumn("blocked", col("registered_domain").isin(blockedDomains: _*))

  /** Per-registered-domain corpus stats: doc count, distinct hosts, and
    * whether the domain is blocklisted — the table a curation run reports
    * before dropping blocked domains.
    */
  def domainStats(docs: DataFrame, blockedDomains: Seq[String],
      urlCol: String = "url"): DataFrame =
    domainScreen(docs, blockedDomains, urlCol)
      .groupBy("registered_domain", "blocked")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("host")).as("n_hosts"))
}
