package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** The one spec-side-table contract shared by every persisted index
  * family (fingerprint, MinHash band-bucket, simhash chunk, embedding
  * LSH): a one-row `<index>__spec` managed table holding the parameters
  * the index was built with, persisted beside the index itself.
  *
  * Why it exists: band/chunk/signature membership is a pure function of
  * (text, parameters). A probe or append that recomputes signatures with
  * DIFFERENT parameters produces hashes that silently never match — the
  * query "succeeds" and finds nothing, which at ingest time is silent
  * recall loss. The spec turns that into a loud failure.
  *
  * Ordering contract: [[write]] the spec BEFORE the index table. A crash
  * between the two writes then leaves a spec with no index — harmless,
  * the next build overwrites both, and probes fail on the missing index
  * table itself — rather than an index with no spec, whose probes would
  * run unguarded with defaulted parameters (exactly the failure the spec
  * exists to prevent). [[readRequired]] enforces the other half: an
  * index table whose spec is absent is treated as half-built and
  * rejected, never silently defaulted.
  */
object IndexSpec {

  /** Naming convention: the spec lives at `<indexTable>__spec`. */
  def specTable(indexTable: String): String = s"${indexTable}__spec"

  /** Persist the one-row parameter frame for `indexTable`. Call this
    * BEFORE writing the index table itself (see the ordering contract
    * above).
    */
  def write(spec: DataFrame, indexTable: String): Unit =
    Sinks.saveTable(spec, specTable(indexTable))

  /** The spec row for `indexTable`, or an [[IllegalStateException]] when
    * the spec table is missing. Each family reads its own typed fields
    * off the row and `require`s them against the caller's parameters.
    */
  def readRequired(spark: SparkSession, indexTable: String): Row = {
    val st = specTable(indexTable)
    if (!spark.catalog.tableExists(st))
      throw new IllegalStateException(
        s"index table $indexTable has no spec table $st — a crash " +
          "between the index and spec writes, or a table not built by " +
          "its build function. Rebuild the index; probing without the " +
          "parameter guard risks silent recall loss.")
    spark.table(st).head()
  }
}
