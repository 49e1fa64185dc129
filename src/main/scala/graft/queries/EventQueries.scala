package graft.queries

import graft.Tables
import graft.operators.EventAnalytics

/** Behavioral event-log analytics over `events`: ordered funnel
  * completion and time-decayed engagement totals
  * ([[graft.operators.EventAnalytics]]). Oracle SQL is DuckDB dialect;
  * both queries ride the library's exactness contracts — integer counts,
  * single-division doubles, and DECIMAL(28,10)-pinned weighted sums
  * ([[Exact]] scaladoc). */
object EventQueries {

  /** view → click → purchase ordered funnel. The oracle resolves the
    * same greedy-earliest chain with sorted list aggregates and chained
    * CTEs (each stage's bind needs the previous stage's timestamp);
    * strictly-after comparisons run on µs-identical timestamps in both
    * engines (Spark truncates the parquet NANOS to µs, the oracle's
    * comparisons are value-order-identical since the corpus is
    * µs-aligned). Conversion ratios are single exact divisions of
    * BIGINT counts. */
  val q94 = Q(
    "q94_funnel",
    (spark, dir) => EventAnalytics.funnel(
      Tables.load(spark, dir, "events"), Seq("view", "click", "purchase")),
    Some("""WITH f AS (
        SELECT user_id, event_type, ts FROM events
        WHERE event_type IN ('view', 'click', 'purchase')),
      pu AS (SELECT user_id,
          list_sort(list_filter(list(CASE WHEN event_type = 'view' THEN ts END),
            x -> x IS NOT NULL)) AS a0,
          list_sort(list_filter(list(CASE WHEN event_type = 'click' THEN ts END),
            x -> x IS NOT NULL)) AS a1,
          list_sort(list_filter(list(CASE WHEN event_type = 'purchase' THEN ts END),
            x -> x IS NOT NULL)) AS a2
        FROM f GROUP BY user_id),
      s0 AS (SELECT user_id, a1, a2, a0[1] AS t0 FROM pu),
      s1 AS (SELECT user_id, a2, t0,
          list_filter(a1, x -> x > t0)[1] AS t1 FROM s0),
      s2 AS (SELECT user_id, t0, t1,
          list_filter(a2, x -> x > t1)[1] AS t2 FROM s1),
      c AS (SELECT COUNT(t0) AS n0, COUNT(t1) AS n1, COUNT(t2) AS n2 FROM s2)
      SELECT CAST(1 AS INTEGER) AS stage_idx, 'view' AS stage, n0 AS n_users,
        CASE WHEN n0 > 0 THEN 1.0 END AS conv_from_first,
        CASE WHEN n0 > 0 THEN 1.0 END AS conv_from_prev
      FROM c
      UNION ALL
      SELECT CAST(2 AS INTEGER), 'click', n1,
        CASE WHEN n0 > 0 THEN CAST(n1 AS DOUBLE) / n0 END,
        CASE WHEN n0 > 0 THEN CAST(n1 AS DOUBLE) / n0 END
      FROM c
      UNION ALL
      SELECT CAST(3 AS INTEGER), 'purchase', n2,
        CASE WHEN n0 > 0 THEN CAST(n2 AS DOUBLE) / n0 END,
        CASE WHEN n1 > 0 THEN CAST(n2 AS DOUBLE) / n1 END
      FROM c""")
  )

  /** Per-user decayed engagement, 7-day half-life. The oracle mirrors
    * the exact construction: anchor = MAX(epoch µs) via a 1-row cross
    * join, one double division + floor for the bucket, an exact
    * power-of-two weight, and the DECIMAL(28,10) sum discipline for the
    * weighted total. */
  val q95 = Q(
    "q95_decayed_value",
    (spark, dir) => EventAnalytics.decayedSum(
      Tables.load(spark, dir, "events"), halfLifeDays = 7),
    Some(s"""WITH a AS (SELECT MAX(epoch_us(ts)) AS anchor_us FROM events),
      w AS (SELECT user_id,
          FLOOR((anchor_us - epoch_us(ts)) / (86400000000.0 * 7)) AS buckets,
          value
        FROM events, a)
      SELECT user_id, COUNT(*) AS n_events,
        ${Exact.sqlSum("value * power(2.0, -buckets)")} AS decayed_value
      FROM w GROUP BY user_id""")
  )

  val all: Seq[Q] = Seq(q94, q95)
}
