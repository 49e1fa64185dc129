package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Funnel chain semantics (strictly-after, greedy-earliest, missing-stage
  * nulls) and decayed-sum arithmetic on hand corpora with known answers. */
class EventAnalyticsSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def ev(rows: (Long, String, String, Double)*) =
    rows.map { case (u, t, at, v) => (u, t, ts(at), v) }
      .toDF("user_id", "event_type", "ts", "value")
      .withColumn("event_id", monotonically_increasing_id())

  test("funnel: strictly-after chains, out-of-order skips, equal-ts rejected") {
    val events = ev(
      // u1: clean full chain
      (1L, "view", "2024-01-01 00:00:01", 0),
      (1L, "click", "2024-01-01 00:00:02", 0),
      (1L, "purchase", "2024-01-01 00:00:03", 0),
      // u2: click BEFORE the first view must be skipped; later chain works
      (2L, "click", "2024-01-01 00:00:01", 0),
      (2L, "view", "2024-01-01 00:00:02", 0),
      (2L, "click", "2024-01-01 00:00:05", 0),
      (2L, "purchase", "2024-01-01 00:00:06", 0),
      // u3: no click — purchase can't bind without the middle stage
      (3L, "view", "2024-01-01 00:00:04", 0),
      (3L, "purchase", "2024-01-01 00:00:05", 0),
      // u4: no view — never enters the funnel
      (4L, "click", "2024-01-01 00:00:01", 0),
      (4L, "purchase", "2024-01-01 00:00:02", 0),
      // u5: click at the SAME instant as view — strictly-after rejects
      (5L, "view", "2024-01-01 00:00:07", 0),
      (5L, "click", "2024-01-01 00:00:07", 0))

    val out = EventAnalytics
      .funnel(events, Seq("view", "click", "purchase"))
      .collect()
      .map(r => r.getInt(0) -> ((r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap

    assert(out(1) === (("view", 4L, 1.0, 1.0)))
    assert(out(2) === (("click", 2L, 0.5, 0.5)))
    assert(out(3) === (("purchase", 2L, 0.5, 1.0)))
  }

  test("funnel: single stage degenerates to distinct-user count") {
    val events = ev(
      (1L, "view", "2024-01-01 00:00:01", 0),
      (1L, "view", "2024-01-01 00:00:02", 0),
      (2L, "click", "2024-01-01 00:00:01", 0))
    val out = EventAnalytics.funnel(events, Seq("view")).collect()
    assert(out.length === 1)
    assert(out.head.getLong(2) === 1L) // u1 only; repeats collapse
  }

  test("funnel: rejects duplicate stages") {
    intercept[IllegalArgumentException](
      EventAnalytics.funnel(ev(), Seq("view", "view")))
  }

  test("decayedSum: exact power-of-two weights off the max-ts anchor") {
    val events = ev(
      (1L, "view", "2024-01-10 00:00:00", 10.0), // anchor row: weight 1
      (1L, "view", "2024-01-09 00:00:00", 4.0),  // 1 day  -> bucket 1, w .5
      (2L, "view", "2024-01-07 12:00:00", 8.0))  // 2.5 d  -> bucket 2, w .25
    val out = EventAnalytics.decayedSum(events, halfLifeDays = 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(out(1L) === ((2L, 12.0)))
    assert(out(2L) === ((1L, 2.0)))
  }

  test("decayedSum: partition-order independence of the weighted total") {
    val events = graft.Tables.load(spark, sf, "events")
    val a = EventAnalytics.decayedSum(events, 7).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val b = EventAnalytics.decayedSum(events.repartition(13), 7).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(a === b) // DECIMAL(28,10) sum: bit-equal under any partitioning
  }

  test("cohortRetention: offsets off the first-event week, exact fractions") {
    val events = ev(
      // cohort week of 2024-01-01 (Monday): u1 active wk0+wk1, u2 wk0 only
      (1L, "view", "2024-01-02 10:00:00", 0),
      (1L, "view", "2024-01-09 10:00:00", 0),
      (2L, "view", "2024-01-03 10:00:00", 0),
      // cohort week of 2024-01-08: u3 active wk0 and wk2
      (3L, "view", "2024-01-10 10:00:00", 0),
      (3L, "view", "2024-01-24 10:00:00", 0))
    val out = EventAnalytics.cohortRetention(events).collect()
      .map(r => (r.getTimestamp(0).toString, r.getInt(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out(("2024-01-01 00:00:00.0", 0)) === ((2L, 1.0)))
    assert(out(("2024-01-01 00:00:00.0", 1)) === ((1L, 0.5)))
    assert(out(("2024-01-08 00:00:00.0", 0)) === ((1L, 1.0)))
    assert(out(("2024-01-08 00:00:00.0", 2)) === ((1L, 1.0)))
    assert(out.size === 4) // no zero-filled or phantom cells
  }

  test("transitionMatrix: adjacency counts and row-normalized probabilities") {
    val events = ev(
      (1L, "view", "2024-01-01 00:00:01", 0),
      (1L, "click", "2024-01-01 00:00:02", 0),
      (1L, "view", "2024-01-01 00:00:03", 0),
      (2L, "view", "2024-01-01 00:00:01", 0),
      (2L, "click", "2024-01-01 00:00:02", 0),
      (3L, "view", "2024-01-01 00:00:09", 0)) // singleton: no transition
    val out = EventAnalytics.transitionMatrix(events).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out(("view", "click")) === ((2L, 1.0)))
    assert(out(("click", "view")) === ((1L, 1.0)))
    assert(out.size === 2) // no cross-user adjacency invented
  }

  test("attributionCounts: window bounds are [ts-w, ts), per-user only") {
    val events = ev(
      (1L, "view", "2024-01-01 00:00:00", 0),     // 60 min before: in (>=)
      (1L, "view", "2024-01-01 00:30:00", 0),     // in window, latest
      (1L, "purchase", "2024-01-01 01:00:00", 0), // target
      (2L, "view", "2024-01-01 00:59:00", 0),     // other user: excluded
      (2L, "purchase", "2024-01-01 02:00:00", 0)) // u2: no view in window
    val out = EventAnalytics
      .attributionCounts(events, "purchase", "view", 60).collect()
      .map(r => r.getTimestamp(1).toString ->
        ((r.getLong(2), Option(r.getTimestamp(3)).map(_.toString)))).toMap
    assert(out("2024-01-01 01:00:00.0") ===
      ((2L, Some("2024-01-01 00:30:00.0"))))
    assert(out("2024-01-01 02:00:00.0") === ((0L, None)))
  }

  test("denseHourlyCounts: zero-fills every key over the global hour span") {
    val events = ev(
      (1L, "view", "2024-01-01 00:10:00", 0),
      (1L, "view", "2024-01-01 02:20:00", 0), // hour 1 empty for view
      (2L, "click", "2024-01-01 01:30:00", 0))
    val out = EventAnalytics.denseHourlyCounts(events).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString) ->
        r.getLong(2)).toMap
    assert(out.size === 6) // 2 keys x 3 hours, dense
    assert(out(("view", "2024-01-01 00:00:00.0")) === 1L)
    assert(out(("view", "2024-01-01 01:00:00.0")) === 0L)
    assert(out(("view", "2024-01-01 02:00:00.0")) === 1L)
    assert(out(("click", "2024-01-01 01:00:00.0")) === 1L)
    assert(out(("click", "2024-01-01 00:00:00.0")) === 0L)
  }

  test("funnelDwellPercentiles: nearest-rank picks over chain dwell times") {
    val events = ev(
      // u1: full chain — view→click 10 s, click→purchase 60 s
      (1L, "view", "2024-01-01 00:00:00", 0),
      (1L, "click", "2024-01-01 00:00:10", 0),
      (1L, "purchase", "2024-01-01 00:01:10", 0),
      // u2: view→click 30 s, no purchase
      (2L, "view", "2024-01-01 00:00:00", 0),
      (2L, "click", "2024-01-01 00:00:30", 0),
      // u3: view only — contributes to no dwell pair
      (3L, "view", "2024-01-01 00:00:00", 0),
      // u4: click strictly BEFORE view — chain never binds, no dwell
      (4L, "click", "2024-01-01 00:00:03", 0),
      (4L, "view", "2024-01-01 00:00:05", 0))
    val out = EventAnalytics
      .funnelDwellPercentiles(events, Seq("view", "click", "purchase"))
      .collect()
      .map(r => r.getInt(0) -> ((r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // stage 2 dwells {10 s, 30 s}: n=2, rank ceil(.5·2)=1 → 10 s,
    // ceil(.9·2)=2 → 30 s, ceil(.99·2)=2 → 30 s (µs integers)
    assert(out(2) === (("view", "click", 2L, 10000000L, 30000000L, 30000000L)))
    // stage 3 has the single 60 s dwell: every percentile is that value
    assert(out(3) === (("click", "purchase", 1L,
      60000000L, 60000000L, 60000000L)))
    assert(out.size === 2)
  }

  test("funnelDwellPercentiles: custom percentiles, p=1 is the max") {
    val events = ev(
      (1L, "view", "2024-01-01 00:00:00", 0),
      (1L, "click", "2024-01-01 00:00:01", 0),
      (2L, "view", "2024-01-01 00:00:00", 0),
      (2L, "click", "2024-01-01 00:00:02", 0),
      (3L, "view", "2024-01-01 00:00:00", 0),
      (3L, "click", "2024-01-01 00:00:04", 0))
    val out = EventAnalytics.funnelDwellPercentiles(events,
      Seq("view", "click"), percentiles = Seq(0.25, 1.0)).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.schema.fieldNames.takeRight(2).toSeq === Seq("p25_us", "p100_us"))
    assert(r.getLong(4) === 1000000L) // ceil(.25·3)=1 → smallest
    assert(r.getLong(5) === 4000000L) // p=1 → rank n → max
  }

  test("funnelDwellPercentiles: rejects single stage and bad percentiles") {
    intercept[IllegalArgumentException](
      EventAnalytics.funnelDwellPercentiles(ev(), Seq("view")))
    intercept[IllegalArgumentException](
      EventAnalytics.funnelDwellPercentiles(ev(), Seq("view", "click"),
        percentiles = Seq(0.0)))
  }

  test("sessionize: breaks at gap >= 30 min exactly, end = last + gap, " +
      "decimal-exact totals") {
    val events = ev(
      // u1 session A: two events 29:59.999999 apart — strictly under the
      // gap, stays one session
      (1L, "view", "2024-01-01 00:00:00", 1.5),
      (1L, "view", "2024-01-01 00:29:59.999999", 2.5),
      // u1 session B: exactly 30:00.000000 after the previous event — the
      // >= boundary BREAKS
      (1L, "view", "2024-01-01 00:59:59.999999", 4.0),
      // u2: single event
      (2L, "click", "2024-01-01 12:00:00", 7.0))
    val out = EventAnalytics.sessionize(events, gapMinutes = 30).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getTimestamp(0).toString) ->
        ((r.getTimestamp(1).toString, r.getAs[Long]("n_events"),
          r.getAs[Double]("total_value")))).toMap
    assert(out.size === 3)
    assert(out((1L, "2024-01-01 00:00:00.0")) ===
      (("2024-01-01 00:59:59.999999", 2L, 4.0)))
    assert(out((1L, "2024-01-01 00:59:59.999999")) ===
      (("2024-01-01 01:29:59.999999", 1L, 4.0)))
    assert(out((2L, "2024-01-01 12:00:00.0")) ===
      (("2024-01-01 12:30:00.0", 1L, 7.0)))
  }

  test("sessionize: matches the streaming session contract on the corpus") {
    // batch/backfill parity: same gap, same corpus — identical session
    // rows as the oracle-verified streaming output contract (schema +
    // per-user session counts spot-checked; full equality is q105 vs the
    // q59/q65/q104 shared oracle)
    val events = graft.Tables.load(spark, sf, "events")
    val out = EventAnalytics.sessionize(events, gapMinutes = 30)
    assert(out.columns.toSeq === Seq("session_start", "session_end",
      "user_id", "n_events", "total_value"))
    val total = out.agg(sum(col("n_events"))).head().getLong(0)
    assert(total === events.count()) // every event lands in exactly one session
  }

  test("valueOutliers: near-constant group (rounded variance < 0) flags " +
      "nothing instead of NaN-flagging every row") {
    // all-0.1 group: decimal-rounded E[x²] = 0.01 dips BELOW μ² =
    // 0.010000000000000002, so the unclamped variance is negative — sqrt
    // would NaN (and Spark's NaN > 3 is TRUE, flagging all 21 rows)
    val rows = (1 to 21).map(i => (1L, "view", f"2024-01-01 00:${i}%02d:00", 0.1))
    assert(EventAnalytics.valueOutliers(ev(rows: _*)).collect().isEmpty)
  }

  test("valueOutliers: flags beyond |z|>t, sigma-zero groups flag nothing") {
    val base = (1 to 20).map(i =>
      (1L, "view", f"2024-01-01 00:${i}%02d:00", 1.0)) :+
      (1L, "view", "2024-01-01 00:21:00", 100.0) :+ // the outlier
      (2L, "click", "2024-01-01 00:01:00", 5.0) :+  // sigma=0 group
      (2L, "click", "2024-01-01 00:02:00", 5.0)
    val out = EventAnalytics.valueOutliers(ev(base: _*), threshold = 3.0)
      .collect()
    assert(out.length === 1)
    assert(out.head.getString(1) === "view")
    assert(out.head.getDouble(2) === 100.0)
    assert(out.head.getDouble(3) > 3.0)
  }

  test("scd2Intervals: runs collapse, intervals chain, one current row per key") {
    val rows = ev(
      (1L, "view", "2024-01-01 00:00:00", 0.0),
      (1L, "view", "2024-01-01 00:05:00", 0.0),  // same run
      (1L, "click", "2024-01-01 00:10:00", 0.0), // change → v2
      (1L, "view", "2024-01-01 00:20:00", 0.0),  // back → v3 (runs, not distinct)
      (2L, "buy", "2024-01-01 01:00:00", 0.0))
    val out = EventAnalytics.scd2Intervals(rows).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("version")) ->
        (r.getAs[String]("attr"), r.getAs[java.sql.Timestamp]("valid_from"),
          Option(r.getAs[java.sql.Timestamp]("valid_to")),
          r.getAs[Boolean]("is_current"))).toMap
    assert(out.size === 4)
    assert(out((1L, 1)) === (("view", ts("2024-01-01 00:00:00"),
      Some(ts("2024-01-01 00:10:00")), false)))
    assert(out((1L, 2)) === (("click", ts("2024-01-01 00:10:00"),
      Some(ts("2024-01-01 00:20:00")), false)))
    assert(out((1L, 3)) === (("view", ts("2024-01-01 00:20:00"), None, true)))
    assert(out((2L, 1)) === (("buy", ts("2024-01-01 01:00:00"), None, true)))
    // intervals chain exactly: each close equals the next open (asserted
    // above per row), and every key has exactly one open interval
    assert(out.count(_._2._4) === 2)
  }

  test("madOutliers: flags via median/MAD, MAD-zero groups flag nothing") {
    val base = (1 to 9).map(i =>
      (1L, "view", f"2024-01-01 00:${i}%02d:00", i.toDouble)) :+
      (1L, "view", "2024-01-01 00:10:00", 1000.0) :+ // the outlier
      (2L, "click", "2024-01-01 00:01:00", 5.0) :+   // MAD=0 group
      (2L, "click", "2024-01-01 00:02:00", 5.0)
    val out = EventAnalytics.madOutliers(ev(base: _*), threshold = 3.5)
      .collect()
    // med=5, MAD=2 → mz(1000) = .6745·995/2 ≈ 335; everything else ≤ 1.35
    assert(out.length === 1)
    assert(out.head.getString(1) === "view")
    assert(out.head.getDouble(2) === 1000.0)
    assert(math.abs(out.head.getDouble(3) - 0.6745 * 995.0 / 2.0) < 1e-9)
  }

  test("basketPairAssociations: hand-computed baskets, lift and confidences") {
    val rows = ev(
      // u1 session 1: {view, click}; session 2 (2h later): {view}
      (1L, "view", "2024-01-01 00:00:00", 0.0),
      (1L, "click", "2024-01-01 00:10:00", 0.0),
      (1L, "view", "2024-01-01 00:12:00", 0.0), // duplicate item in basket
      (1L, "view", "2024-01-01 02:00:00", 0.0),
      // u2 session: {click, buy}
      (2L, "click", "2024-01-01 01:00:00", 0.0),
      (2L, "buy", "2024-01-01 01:05:00", 0.0))
    val out = EventAnalytics.basketPairAssociations(rows)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_baskets"), r.getAs[Long]("c_a"),
          r.getAs[Long]("c_b"), r.getAs[Long]("c_both"),
          r.getAs[Long]("lift_1e6"), r.getAs[Long]("conf_a_b_1e6"),
          r.getAs[Long]("conf_b_a_1e6"))).toMap
    assert(out.size === 2)
    // 3 baskets; c(view)=2, c(click)=2, c(buy)=1
    // (click, view): c_both=1, lift = 3·1/(2·2) = 0.75
    assert(out(("click", "view")) === ((3L, 2L, 2L, 1L, 750000L, 500000L, 500000L)))
    // (buy, click): c_both=1, lift = 3·1/(1·2) = 1.5
    assert(out(("buy", "click")) === ((3L, 1L, 2L, 1L, 1500000L, 1000000L, 500000L)))
  }

  test("scd2Intervals: plans a single exchange (lag/lead/version share one sort)") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    def countShuffles(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => countShuffles(a.executedPlan)
      case s: QueryStageExec => countShuffles(s.plan)
      case _: ReusedExchangeExec => 0
      case e: ShuffleExchangeLike => 1 + e.children.map(countShuffles).sum
      case _ => p.children.map(countShuffles).sum
    }
    val df = EventAnalytics.scd2Intervals(
      ev((1L, "view", "2024-01-01 00:00:00", 0.0)))
    df.collect() // materialize so AQE's final plan is in place
    assert(countShuffles(df.queryExecution.executedPlan) === 1,
      df.queryExecution.executedPlan.toString)
  }
}
