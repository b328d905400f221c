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

  /** Crawl-frontier URL canonicalization — the rules every large-scale
    * crawler applies so that cosmetically-different URLs of the same
    * resource collapse before fetch/dedup accounting:
    *   - scheme and host lowercased;
    *   - fragment dropped;
    *   - default ports dropped (http:80, https:443), explicit
    *     non-default ports kept;
    *   - tracking parameters removed (`utm_*`, `gclid`, `fbclid`,
    *     `ref`), remaining query parameters SORTED (parameter order is
    *     almost never semantic; sorting makes the canonical form
    *     order-independent);
    *   - trailing slashes stripped from the path, empty path → "/".
    * Pure per-row projection over `parse_url`/regexp built-ins — no
    * shuffle, no UDF.
    */
  def canonicalUrl(u: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val scheme = lower(parse_url(u, lit("PROTOCOL")))
    val authority = coalesce(parse_url(u, lit("AUTHORITY")), lit(""))
    val host = lower(coalesce(parse_url(u, lit("HOST")), lit("")))
    val port = regexp_extract(authority, ":([0-9]+)$", 1)
    val keepPort = when(port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    val path0 = regexp_replace(
      coalesce(parse_url(u, lit("PATH")), lit("")), "/+$", "")
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val params = filter(
      split(coalesce(parse_url(u, lit("QUERY")), lit("")), "&"),
      p => p =!= "" && !p.rlike("^(utm_[^=]*|gclid|fbclid|ref)="))
    val canonQ = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host, keepPort, path,
      when(canonQ === "", lit("")).otherwise(concat(lit("?"), canonQ)))
  }

  /** URL-level dedup over the canonical form: one row per canonical URL
    * with the lowest doc_id as the keeper (the corpus-wide keep-lowest
    * convention) and the copy count — the frontier's seen-set view.
    * One hash aggregate on the canonical key; at crawl scale this is
    * the same shape as exact text dedup and composes with the persisted
    * fingerprint/bloom indexes for incremental frontier screening.
    */
  def canonicalUrlDedup(docs: DataFrame, urlCol: String = "url"): DataFrame =
    docs.withColumn("canonical_url", canonicalUrl(col(urlCol)))
      .groupBy("canonical_url")
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

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
