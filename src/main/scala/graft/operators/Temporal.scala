package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Temporal join operators.
  *
  * The reference corpus has only inner equi-joins (SURVEY §2.3: "no
  * outer/semi/anti/theta/range/as-of joins exist"), but any event-log
  * workload — and any training-data pipeline joining logs to labels or
  * snapshots — needs the two classic temporal joins:
  *
  *   - as-of join: attach to each fact row the most recent dimension
  *     observation at-or-before its timestamp;
  *   - interval (range) join: match point events into time windows.
  *
  * Both are implemented as shuffle-bounded compositions of built-in
  * operators (union + window, bucket-explode + equi-join) rather than the
  * naive range-predicate join Spark would otherwise plan as a
  * BroadcastNestedLoopJoin — O(n·m) per key and a scale killer at 100 TB.
  */
object Temporal {

  /** As-of join: for each `left` row, the payload of the latest `right`
    * row with `rightTs <= leftTs` in the same key group (direction
    * "backward", the default), or the earliest right row with
    * `rightTs >= leftTs` ("forward"), as new columns
    * `prefix + payloadCol` (null when no such right row exists).
    *
    * Spark-first plan: both sides are tagged and unioned, then ONE window
    * pass per key ordered by (ts, tag) carries the latest right payload
    * forward via `last(_, ignoreNulls = true)` onto every left row. That
    * is a single shuffle of |L|+|R| rows and O(1) running state per key —
    * the same scale envelope as any window aggregate, with no range
    * cross-product anywhere. Right rows sort BEFORE left rows at equal
    * ts (tag 0 < 1), so ts-equality matches, mirroring SQL `ASOF ... >=`.
    *
    * `rightTiebreak` orders right rows that share a timestamp: backward
    * resolves ties to the HIGHEST tiebreak (the latest observation),
    * forward to the LOWEST (the earliest) — the tiebreak's meaning
    * follows the direction. Left-side rows carry nulls in those
    * columns, which cannot reorder them relative to right rows because
    * the tag sorts first.
    *
    * Caveat (documented, inherent to the ignoreNulls sweep): a right row
    * whose payload value is itself null is looked through to the previous
    * right row — nulls in payload columns mean "no observation".
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      rightTiebreak: Seq[String] = Nil,
      prefix: String = "asof_",
      direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"asofJoin: direction must be backward|forward, got $direction")
    require(payload.nonEmpty, "asofJoin needs at least one payload column")
    require(!left.columns.exists(_.startsWith("__")),
      "asofJoin: left columns must not start with __ (internal namespace)")
    val outCols = payload.map(prefix + _)
    require(!left.columns.exists(outCols.contains),
      s"asofJoin: left already has ${outCols.mkString("/")} — pass a " +
        "different prefix instead of silently overwriting")
    val tb = rightTiebreak.map(c => s"__tb_$c")
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__tag", lit(1))
    val r = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__tag")) ++
        payload.map(c => col(c).as(s"__p_$c")) ++
        rightTiebreak.map(c => col(c).as(s"__tb_$c")): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // backward sweeps ts-ascending (last right seen = latest at-or-
    // before); forward sweeps ts-DESCENDING, so the last right seen is
    // the EARLIEST at-or-after. The tag still sorts right rows before
    // left rows at equal ts in both sweeps, keeping >= / <= inclusive.
    // The tiebreak polarity flips with the sweep so its MEANING follows
    // the direction: backward picks the LATEST observation, so ts-ties
    // resolve to the highest tiebreak (tb asc, last-seen = max);
    // forward picks the EARLIEST, so ts-ties resolve to the LOWEST
    // tiebreak (tb desc, last-seen = min).
    val (tsOrd, tbOrd) =
      if (direction == "backward")
        (col("__ts").asc, tb.map(col(_).asc))
      else
        (col("__ts").desc, tb.map(col(_).desc))
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(Seq(tsOrd, col("__tag").asc) ++ tbOrd: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val swept = payload.foldLeft(unioned) { (df, c) =>
      df.withColumn(prefix + c, last(col(s"__p_$c"), ignoreNulls = true).over(w))
    }
    swept
      .filter(col("__tag") === 1)
      .drop("__ts" +: "__tag" +: (payload.map(c => s"__p_$c") ++ tb): _*)
  }

  /** Interval (range) join: inner-join `points` rows into `intervals`
    * rows with `startUs <= pointUs < endUs` within the same key group.
    * All three timestamp columns are epoch-MICROSECOND longs (callers
    * convert timestamps via `unix_micros`); non-key column names must be
    * disjoint between the two frames.
    *
    * Spark-first plan: both sides are assigned coarse time buckets of
    * `bucketUs` — points to one bucket, intervals exploded over the
    * buckets they overlap — turning the range predicate into an
    * EQUI-join on (keys, bucket) plus a residual exact filter. Each
    * (point, interval) pair can meet in at most one bucket (the point's),
    * so no dedup pass is needed. Shuffle volume is |P| + |I|·spanFactor,
    * where spanFactor = avg buckets per interval; pick `bucketUs` near
    * the typical interval width so spanFactor stays ~2. This is the plan
    * that survives 100 TB; the naive `p.ts between i.start and i.end`
    * join degenerates to a per-key nested loop.
    */
  def intervalJoin(
      points: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      pointUs: String,
      startUs: String,
      endUs: String,
      bucketUs: Long = 3600L * 1000000L): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    val p = points.withColumn("__b", floor(col(pointUs) / bucketUs))
    // [start, end) overlaps buckets floor(start/W) .. floor((end-1)/W);
    // empty/inverted intervals produce an empty sequence and drop out.
    val i = intervals
      .filter(col(endUs) > col(startUs))
      .withColumn(
        "__b",
        explode(
          sequence(
            floor(col(startUs) / bucketUs),
            floor((col(endUs) - 1) / bucketUs))))
    p.join(i, keys :+ "__b")
      .filter(col(pointUs) >= col(startUs) && col(pointUs) < col(endUs))
      .drop("__b")
  }

  /** Exponentially-weighted moving average of `valCol` per key, over
    * events ordered by (`tsCol`, `tiebreak`): s₁ = v₁,
    * sᵢ = α·vᵢ + (1−α)·sᵢ₋₁; returns one row per key with the final
    * smoothed value and the observation count. Null observations are
    * excluded up front (keys with none drop out).
    *
    * The fold runs LEFT-TO-RIGHT over a per-key `sort_array`ed
    * collect_list — deliberately, not via window pow()-weight sums:
    * a weighted groupBy-sum of doubles is merge-order-nondeterministic
    * (FP addition doesn't associate), while this fold applies the exact
    * recursion in one deterministic order, bit-reproducible across runs
    * AND engines. Cost model: state is O(events per key) — right for
    * per-user/per-entity histories (bounded by retention); for unbounded
    * per-key histories, window the input first (EWMA over a bounded
    * trailing slice), which this same operator serves downstream of a
    * time filter.
    */
  def ewma(
      events: DataFrame,
      keys: Seq[String],
      tsCol: String,
      tiebreak: String,
      valCol: String,
      alpha: Double = 0.2): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    val a = lit(alpha)
    val q = lit(1.0 - alpha)
    events
      .filter(col(valCol).isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n_obs"),
        sort_array(collect_list(struct(
          col(tsCol).as("t"), col(tiebreak).as("b"),
          col(valCol).cast("double").as("v")))).as("__ord"))
      .withColumn("ewma", round(
        aggregate(col("__ord"), lit(null).cast("double"),
          (acc, x) => coalesce(a * x.getField("v") + q * acc,
            x.getField("v"))), 4))
      .drop("__ord")
  }

  // ------------------------------------------------------------------
  // Gate instantiations over the driver's events table
  // ------------------------------------------------------------------

  /** q76: for every 'view' event, the most recent at-or-before 'purchase'
    * per user (epoch-µs timestamp + value; -1/0.0 sentinels when the user
    * has no prior purchase, keeping the output columns non-null for a
    * stable cross-engine hash). Oracle: DuckDB `ASOF LEFT JOIN`.
    */
  def viewsWithLastPurchase(events: DataFrame): DataFrame = {
    val views = events
      .filter(col("event_type") === "view")
      .select("user_id", "event_id", "ts")
    val purchases = events
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"),
        col("event_id").as("p_event_id"))
    // tiebreak pins which purchase wins if two ever share a (user, µs);
    // the ASOF oracle leaves ties engine-arbitrary, but the testdata is
    // tie-free (verified) and real data should carry the pin anyway
    asofJoin(views, purchases, Seq("user_id"), "ts", "ts",
      payload = Seq("ts", "value"), rightTiebreak = Seq("p_event_id"))
      .select(
        col("user_id"),
        col("event_id"),
        unix_micros(col("ts")).as("view_us"),
        coalesce(unix_micros(col("asof_ts")), lit(-1L)).as("purchase_us"),
        coalesce(col("asof_value"), lit(0.0)).as("purchase_value"))
  }

  /** q88: the forward twin of [[viewsWithLastPurchase]] — for every
    * 'view', the EARLIEST at-or-after 'purchase' per user ("what did
    * this view lead to"), the attribution direction. Same sweep, ts
    * order reversed; oracle: DuckDB `ASOF LEFT JOIN ... v.ts <= p.ts`.
    */
  def viewsWithNextPurchase(events: DataFrame): DataFrame = {
    val views = events
      .filter(col("event_type") === "view")
      .select("user_id", "event_id", "ts")
    val purchases = events
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"),
        col("event_id").as("p_event_id"))
    asofJoin(views, purchases, Seq("user_id"), "ts", "ts",
      payload = Seq("ts", "value"), rightTiebreak = Seq("p_event_id"),
      direction = "forward")
      .select(
        col("user_id"),
        col("event_id"),
        unix_micros(col("ts")).as("view_us"),
        coalesce(unix_micros(col("asof_ts")), lit(-1L))
          .as("next_purchase_us"),
        coalesce(col("asof_value"), lit(0.0)).as("next_purchase_value"))
  }

  /** q77: per purchase, how many 'view' events the same user produced in
    * the hour starting at the purchase ([ts, ts+1h)), plus their summed
    * value — the "attribution window" shape. Composes [[intervalJoin]]
    * with bucket width = window width (spanFactor ≤ 2), then left-joins
    * the counts back so zero-view purchases survive.
    */
  def purchaseWindowViews(events: DataFrame): DataFrame = {
    val hourUs = 3600L * 1000000L
    val purchases = events
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id"),
        col("event_id").as("purchase_id"),
        unix_micros(col("ts")).as("p_start"))
      .withColumn("p_end", col("p_start") + hourUs)
    val views = events
      .filter(col("event_type") === "view")
      .select(
        col("user_id"),
        unix_micros(col("ts")).as("v_us"),
        col("value").as("view_value"))
    val matched = intervalJoin(views, purchases, Seq("user_id"),
      "v_us", "p_start", "p_end", bucketUs = hourUs)
      .groupBy("purchase_id")
      .agg(
        count(lit(1)).as("n_views"),
        sum(col("view_value").cast("decimal(18,2)")).cast("double")
          .as("sum_view_value"))
    purchases
      .join(matched, Seq("purchase_id"), "left")
      .select(
        col("purchase_id"),
        col("user_id"),
        coalesce(col("n_views"), lit(0L)).as("n_views"),
        coalesce(col("sum_view_value"), lit(0.0)).as("sum_view_value"))
  }

  /** Trailing time-RANGE rolling stats per key: for every event, the
    * count and average of `valueCol` over that key's events in the
    * PRECEDING `windowSeconds` (inclusive of the current instant) — the
    * "activity in the last 24 h as of each event" feature every
    * behavioral model wants. A RANGE frame over event-time seconds, NOT
    * a ROWS frame: gaps and bursts change the member set, and same-
    * second ties are all included, so the frame is a deterministic
    * function of the data (a ROWS frame over ties is not). Values are
    * quantized to DECIMAL(20,6) and summed exactly inside the frame;
    * the one division per row is IEEE and the average is emitted RAW
    * (un-rounded): exact decimal in, one correctly-rounded division
    * out is already bit-deterministic, whereas a final round(…, n)
    * would re-introduce the engines' divergent double-rounding at
    * boundary values (DuckDB scales by 10ⁿ in floating point; Spark
    * rounds the exact binary expansion — they disagree on x.xxxx5).
    *
    * Scale shape: one shuffle keyed by `keyCol`, then a per-key sort
    * with an O(1)-per-row sliding frame. Skew lives with the hottest
    * single key; beyond that, salt upstream or pre-aggregate to
    * per-(key, second) rows first.
    */
  def rollingStats(events: DataFrame, keyCol: String = "user_id",
      valueCol: String = "value", windowSeconds: Long = 86400): DataFrame = {
    require(windowSeconds >= 1, "rollingStats: windowSeconds must be >= 1")
    val w = Window.partitionBy(keyCol).orderBy(col("sec"))
      .rangeBetween(-(windowSeconds - 1), 0)
    events
      .select(col("event_id"), col(keyCol),
        col("ts").cast("long").as("sec"),
        col(valueCol).cast(DecimalType(20, 6)).as("v"))
      .select(col("event_id"), col(keyCol), col("sec"),
        count(lit(1)).over(w).as("n_win"),
        (sum(col("v")).over(w).cast("double") /
          count(lit(1)).over(w).cast("double")).as("avg_win"))
  }

  /** SCD type-2 history build: collapse a stack of corpus snapshots —
    * one row per (key, version) present in that snapshot, with `stateCol`
    * the content state to compare (typically the normalized fingerprint)
    * — into validity runs `[valid_from, valid_to]` (version numbers,
    * inclusive) during which the state was unchanged. A key absent from
    * an intermediate version closes its run and a later reappearance
    * opens a new one (delete + re-add, not one long run), detected by a
    * version-number gap; version numbers must therefore be consecutive
    * integers across snapshots. `is_current` marks runs alive at
    * `latestVersion`.
    *
    * Plan: one hash shuffle on `keyCol` for the lag/running-sum window;
    * the run groupBy keys on (key, run) which the key-partitioning
    * already clusters, so Catalyst plans no second exchange. State per
    * run is constant by construction (a change starts a new run), so
    * `min(state)` reads the run's state without another comparison.
    * Nothing here depends on snapshot count: S snapshots of a 100-TB
    * corpus shuffle S×|keys| fingerprint rows once.
    */
  def scd2History(
      snapshots: DataFrame,
      keyCol: String,
      versionCol: String,
      stateCol: String,
      latestVersion: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(versionCol)
    val run = Window.partitionBy(keyCol).orderBy(versionCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    snapshots
      .withColumn("_new_run",
        (lag(col(stateCol), 1).over(w).isNull ||
          lag(col(stateCol), 1).over(w) =!= col(stateCol) ||
          lag(col(versionCol), 1).over(w) =!= col(versionCol) - 1)
          .cast("long"))
      .withColumn("_run", sum(col("_new_run")).over(run))
      .groupBy(col(keyCol), col("_run"))
      .agg(
        min(col(versionCol)).as("valid_from"),
        max(col(versionCol)).as("valid_to"),
        min(col(stateCol)).as("state"))
      .withColumn("is_current",
        (col("valid_to") === latestVersion).cast("long"))
      .drop("_run")
  }
}
