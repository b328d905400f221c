package graft.core

import org.apache.spark.sql.DataFrame

/** Round-buffer materialization for iterative fixpoints (connected
  * components, PageRank, HITS): each round's small state table must be
  * cut off from its lineage, or round N re-plans (and may re-run) the
  * whole upstream pipeline N times and the plan grows without bound.
  *
  * Two forms behind one contract:
  *   - `checkpointDir = None` → `localCheckpoint(eager)`: fastest, but
  *     pins the buffer in executor block-manager memory, where it is
  *     lost on executor failure — fine for tests and short jobs;
  *   - `checkpointDir = Some(dir)` → each round is written as parquet
  *     under `dir/<name>` and read back, so lineage is truncated AND
  *     the buffer survives executor loss — the reliable form a 100-TB
  *     run wants (and, measured on the 20x stress corpus, FASTER than
  *     localCheckpoint there: 6.3 vs 8.2 s — see `graft.Stress`).
  *
  * Rounds are tiny relative to the corpus (one row per node), so the
  * per-round I/O is small. Callers must give successive rounds distinct
  * names: the previous round's files may still be read by a
  * convergence check while the next round writes.
  */
object Rounds {

  /** Returns the round materializer for `checkpointDir` — a
    * `(df, name) => df'` that truncates lineage per the contract above.
    */
  def materializer(checkpointDir: Option[String])
      : (DataFrame, String) => DataFrame =
    (df: DataFrame, name: String) => checkpointDir match {
      case Some(dir) =>
        val path = s"$dir/$name"
        df.write.mode("overwrite").parquet(path)
        df.sparkSession.read.parquet(path)
      case None => df.localCheckpoint(eager = true)
    }
}
