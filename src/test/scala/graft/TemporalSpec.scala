package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Relational, Temporal, TextAnalysis}

/** Semantics of the temporal joins, the window-analytics block, and PII
  * redaction on hand-built frames where every expected row is computable
  * by eye — plus plan-shape checks that the scale-bearing claims
  * (single shuffle, no nested-loop join) hold in the physical plan.
  */
class TemporalSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  // --------------------------------------------------------------- asof

  private lazy val asofLeft = Seq(
    // (key, ts, id)
    ("a", 100L, 1L), ("a", 200L, 2L), ("a", 50L, 3L),
    ("b", 100L, 4L)
  ).toDF("k", "ts", "id")

  private lazy val asofRight = Seq(
    // (key, ts, price)
    ("a", 100L, 10.0), ("a", 150L, 20.0),
    ("c", 1L, 99.0)
  ).toDF("k", "ts", "price")

  test("rollingStats: trailing RANGE frame slides by time, includes ties") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val events = Seq(
      (1L, "u1", ts(0L), 10.0),
      (2L, "u1", ts(10L), 20.0),
      (3L, "u1", ts(86400L), 30.0), // sec 0 falls OUT of [1, 86400]
      (4L, "u1", ts(86410L), 40.0),
      (5L, "u2", ts(100L), 1.0),    // same-second tie: both in both
      (6L, "u2", ts(100L), 3.0)     //   frames (RANGE, not ROWS)
    ).toDF("event_id", "user_id", "ts", "value")
    val out = Temporal.rollingStats(events).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getDouble(4))).toMap
    out(1L) shouldBe ((1L, 10.0))
    out(2L) shouldBe ((2L, 15.0))
    out(3L) shouldBe ((2L, 25.0)) // {10s, 86400s} — the 0s event aged out
    out(4L) shouldBe ((2L, 35.0))
    out(5L) shouldBe ((2L, 2.0))
    out(6L) shouldBe ((2L, 2.0))
    an[IllegalArgumentException] should be thrownBy
      Temporal.rollingStats(events, windowSeconds = 0)
  }

  test("asofJoin: latest right at-or-before each left row, per key") {
    val out = Temporal
      .asofJoin(asofLeft, asofRight, Seq("k"), "ts", "ts", Seq("price"))
      .select("id", "asof_price")
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(1)))
      .toMap
    out(1L) shouldBe Some(10.0) // equal ts matches (>= semantics)
    out(2L) shouldBe Some(20.0) // latest of the two priors
    out(3L) shouldBe None       // no right row at-or-before ts=50
    out(4L) shouldBe None       // key 'b' has no right rows at all
  }

  test("asofJoin: right rows at the same ts break ties by rightTiebreak") {
    val right = Seq(("a", 100L, 1L, 5.0), ("a", 100L, 2L, 7.0))
      .toDF("k", "ts", "seq", "price")
    val out = Temporal
      .asofJoin(asofLeft.filter($"id" === 1L), right, Seq("k"), "ts", "ts",
        Seq("price"), rightTiebreak = Seq("seq"))
      .select("asof_price").collect()
    out.head.getDouble(0) shouldBe 7.0 // highest seq wins
  }

  test("asofJoin forward: earliest right at-or-after, per key") {
    val out = Temporal
      .asofJoin(asofLeft, asofRight, Seq("k"), "ts", "ts", Seq("price"),
        direction = "forward")
      .select("id", "asof_price")
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(1)))
      .toMap
    out(1L) shouldBe Some(10.0) // equal ts matches (<= semantics)
    out(2L) shouldBe None       // ts=200: no right at-or-after
    out(3L) shouldBe Some(10.0) // ts=50: earliest of the two laters
    out(4L) shouldBe None       // key 'b' has no right rows
  }

  test("asofJoin forward: ts-ties resolve to the LOWEST tiebreak (earliest)") {
    val right = Seq(("a", 100L, 1L, 5.0), ("a", 100L, 2L, 7.0))
      .toDF("k", "ts", "seq", "price")
    val out = Temporal
      .asofJoin(asofLeft.filter($"id" === 3L), right, Seq("k"), "ts", "ts",
        Seq("price"), rightTiebreak = Seq("seq"), direction = "forward")
      .select("asof_price").collect()
    out.head.getDouble(0) shouldBe 5.0 // seq=1, the earliest observation
  }

  test("asofJoin forward: matches the brute-force as-of on random data") {
    val l = spark.range(300).select(
      (col("id") % 7).cast("string").as("k"),
      pmod(hash(col("id")), lit(1000)).cast("long").as("ts"),
      col("id").as("lid"))
    val r = spark.range(80).select(
      (col("id") % 7).cast("string").as("k"),
      pmod(hash(col("id") * 31), lit(1000)).cast("long").as("ts"),
      col("id").as("rid"))
    val fast = Temporal
      .asofJoin(l, r, Seq("k"), "ts", "ts", Seq("rid"),
        rightTiebreak = Seq("rid"), direction = "forward")
      .select(col("lid"), col("asof_rid"))
    // forward winner = (min ts >= left ts, then min rid)
    val brute = l.join(
      r.select(col("k"), col("ts").as("rts"), col("rid")), Seq("k"), "left")
      .filter(col("rts") >= col("ts") || col("rts").isNull)
      .groupBy("lid")
      .agg(min(struct(col("rts"), col("rid"))).getField("rid").as("asof_rid"))
    val expected = l.select("lid").join(brute, Seq("lid"), "left")
      .select(col("lid"), col("asof_rid"))
    rowSet(fast) shouldBe rowSet(expected)
    fast.filter(col("asof_rid").isNotNull).count() should be > 0L
  }

  test("asofJoin: matches the brute-force as-of on random data") {
    val l = spark.range(300).select(
      (col("id") % 7).cast("string").as("k"),
      pmod(hash(col("id")), lit(1000)).cast("long").as("ts"),
      col("id").as("lid"))
    val r = spark.range(80).select(
      (col("id") % 7).cast("string").as("k"),
      pmod(hash(col("id") * 31), lit(1000)).cast("long").as("ts"),
      col("id").as("rid"))
    val fast = Temporal
      .asofJoin(l, r, Seq("k"), "ts", "ts", Seq("rid"),
        rightTiebreak = Seq("rid"))
      .select(col("lid"), col("asof_rid"))
    // brute force: all at-or-before right rows per left row, keep the
    // (max ts, max rid) winner — the same tiebreak asofJoin pins
    val brute = l.join(
      r.select(col("k"), col("ts").as("rts"), col("rid")), Seq("k"), "left")
      .filter(col("rts") <= col("ts") || col("rts").isNull)
      .groupBy("lid")
      .agg(max(struct(col("rts"), col("rid"))).getField("rid").as("asof_rid"))
    // left rows with NO match drop out of the filter above; re-add them
    val expected = l.select("lid").join(brute, Seq("lid"), "left")
      .select(col("lid"), col("asof_rid"))
    rowSet(fast) shouldBe rowSet(expected)
    fast.filter(col("asof_rid").isNotNull).count() should be > 0L
  }

  test("asofJoin: one shuffle, no nested-loop join in the plan") {
    val p = plan(Temporal.asofJoin(asofLeft, asofRight, Seq("k"), "ts", "ts",
      Seq("price")))
    p should not include "NestedLoop"
    p should not include "CartesianProduct"
    // the only exchange is the window's hash partitioning on the key
    "Exchange hashpartitioning".r.findAllIn(p).size shouldBe 1
  }

  // ----------------------------------------------------------- interval

  private lazy val points = Seq(
    ("a", 100L, 1L), ("a", 500L, 2L), ("a", 1000L, 3L), ("a", 1500L, 4L),
    ("b", 100L, 5L)
  ).toDF("k", "pt", "pid")

  private lazy val intervals = Seq(
    ("a", 100L, 1000L, 10L), // [100,1000): catches 100 (inclusive start),
                             // 500, NOT 1000 (exclusive end); spans buckets
    ("a", 900L, 1600L, 20L), // [900,1600): catches 1000, 1500
    ("a", 700L, 700L, 30L),  // empty interval: catches nothing
    ("c", 0L, 5000L, 40L)    // no points under key 'c'
  ).toDF("k", "lo", "hi", "iid")

  test("intervalJoin: inclusive start, exclusive end, bucket-boundary spans") {
    // bucketUs=256 forces intervals to span multiple buckets
    val got = Temporal
      .intervalJoin(points, intervals, Seq("k"), "pt", "lo", "hi",
        bucketUs = 256L)
      .select("iid", "pid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got shouldBe Set((10L, 1L), (10L, 2L), (20L, 3L), (20L, 4L))
  }

  test("intervalJoin: matches the brute-force range join on random data") {
    val p = spark.range(200).select(
      (col("id") % 5).cast("string").as("k"),
      pmod(hash(col("id")), lit(10000)).cast("long").as("pt"),
      col("id").as("pid"))
    val i = spark.range(60).select(
      (col("id") % 5).cast("string").as("k"),
      pmod(hash(col("id") * 7), lit(9000)).cast("long").as("lo"),
      col("id").as("iid"))
      .withColumn("hi", col("lo") + pmod(hash(col("iid") + 13), lit(3000)))
    val fast = Temporal
      .intervalJoin(p, i, Seq("k"), "pt", "lo", "hi", bucketUs = 512L)
      .select("pid", "iid")
    val brute = p.join(i, Seq("k"))
      .filter(col("pt") >= col("lo") && col("pt") < col("hi"))
      .select("pid", "iid")
    rowSet(fast) shouldBe rowSet(brute)
    fast.count() should be > 0L
  }

  test("intervalJoin: plan is an equi-join, not a nested loop") {
    val p = plan(Temporal.intervalJoin(points, intervals, Seq("k"), "pt",
      "lo", "hi", bucketUs = 256L))
    p should not include "NestedLoop"
    p should not include "CartesianProduct"
  }

  // ------------------------------------------------------------ windows

  test("userEventWindows: lag/delta/rank/moving-average per user") {
    val ev = Seq(
      // user 1 in time order: values 10, 30, 20
      (1L, 100L, 10L, 10.0), (1L, 200L, 11L, 30.0), (1L, 300L, 12L, 20.0),
      (2L, 100L, 13L, 5.0)
    ).toDF("user_id", "us", "event_id", "value")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
        col("event_id"), col("value"))
    val rows = Relational.userEventWindows(ev)
      .orderBy("user_id", "event_seq").collect()
    rows.map(_.getLong(2)) shouldBe Seq(1L, 2L, 3L, 1L)
    Option(rows(0).get(3)) shouldBe None            // first row: no lag
    rows(1).getDouble(4) shouldBe 20.0              // delta 30-10
    rows.map(_.getLong(5)) shouldBe Seq(3L, 1L, 2L, 1L) // rank by value desc
    rows(2).getDouble(6) shouldBe 20.0              // avg(10,30,20)
  }

  // ---------------------------------------------------------------- pii

  test("redactPii: redacts and counts emails, IPs, SSNs, phones") {
    val docs = Seq(
      (1L, "mail bob@example.com and carol@sub.example.org here"),
      (2L, "server 10.0.255.1 rang +1 (555) 123-4567 twice"),
      (3L, "ssn 123-45-6789 leaked"),
      (4L, "clean text with digits 42 and a dot. nothing else")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.redactPii(docs).orderBy("doc_id").collect()
    out(0).getString(5) shouldBe "mail [EMAIL] and [EMAIL] here"
    out(0).getLong(1) shouldBe 2L
    out(1).getString(5) shouldBe "server [IP] rang [PHONE] twice"
    out(1).getLong(2) shouldBe 1L
    out(1).getLong(4) shouldBe 1L
    out(2).getString(5) shouldBe "ssn [SSN] leaked"
    out(2).getLong(3) shouldBe 1L
    out(3).getString(5) shouldBe "clean text with digits 42 and a dot. nothing else"
    Seq(1, 2, 3, 4).map(out(3).getLong(_)).sum shouldBe 0L
  }

  test("redactPii: pure projection — no shuffle in the plan") {
    plan(TextAnalysis.redactPii(tables.documents)) should not include "Exchange"
  }

  test("ewma folds in timestamp order and skips null observations") {
    // rows deliberately out of order; user 1's null at ts=20 is skipped
    val ev = Seq(
      (1L, 3L, 30L, Some(20.0)),
      (1L, 1L, 10L, Some(10.0)),
      (2L, 4L, 10L, Some(5.0)),
      (1L, 2L, 20L, None),
      (3L, 5L, 10L, None) // all-null user drops out entirely
    ).toDF("user_id", "event_id", "ts", "value")
    val out = Temporal.ewma(ev, Seq("user_id"), "ts", "event_id", "value",
      alpha = 0.2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    out shouldBe Map(
      1L -> ((2L, 0.2 * 20.0 + 0.8 * 10.0)), // = 12.0
      2L -> ((1L, 5.0)))
  }

  // ------------------------------------------------------------- scd2

  test("scd2History: runs split on state change AND on version gaps") {
    // key "a": unchanged 1-2, changed at 3       → runs [1,2] and [3,3]
    // key "b": present 1, absent 2, re-added 3
    //          with the SAME state               → gap still splits runs
    // key "c": only the latest version           → one current run
    val snaps = Seq(
      ("a", 1L, "s1"), ("a", 2L, "s1"), ("a", 3L, "s2"),
      ("b", 1L, "x"), ("b", 3L, "x"),
      ("c", 3L, "y")
    ).toDF("k", "version", "state")
    val out = Temporal.scd2History(snaps, "k", "version", "state", 3L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4))).toSet
    out shouldBe Set(
      ("a", 1L, 2L, "s1", 0L), ("a", 3L, 3L, "s2", 1L),
      ("b", 1L, 1L, "x", 0L), ("b", 3L, 3L, "x", 1L),
      ("c", 3L, 3L, "y", 1L))
  }

  test("scd2History plans a single exchange for window plus run groupBy") {
    val snaps = Seq(("a", 1L, "s1"), ("a", 2L, "s2"))
      .toDF("k", "version", "state")
    val plan = Temporal.scd2History(snaps, "k", "version", "state", 2L)
      .queryExecution.executedPlan.toString
    // the groupBy on (k, run) reuses the window's hash-partitioning on k
    "Exchange".r.findAllIn(plan).size shouldBe 1
  }

  test("ewma with alpha=1 is just the latest observation per key") {
    val latest = Temporal.ewma(tables.events, Seq("user_id"), "ts",
      "event_id", "value", alpha = 1.0)
      .select(col("user_id"), col("ewma"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val expected = tables.events.filter(col("value").isNotNull)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), round(col("value"), 4).as("ewma"))
    rowSet(latest) shouldBe rowSet(expected)
  }
}
