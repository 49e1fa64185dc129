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
}
