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

  /** Weekly cohort retention. Both engines truncate weeks to Monday 00:00
    * (Spark `date_trunc('week')` ≡ DuckDB), offsets are exact integers
    * (week stamps differ by whole multiples of 7 days), and retention is a
    * single exact division of BIGINT counts — the [[Exact]] discipline.
    * The oracle CASTs its week stamps back to TIMESTAMP: DuckDB's
    * `date_trunc('week', …)` returns DATE on a plain-TIMESTAMP input
    * (it stayed TIMESTAMP_NS on the nanos corpora earlier rounds shipped),
    * and a DATE would hash as `2024-01-01` against Spark's
    * `2024-01-01 00:00:00`. */
  val q96 = Q(
    "q96_cohort_retention",
    (spark, dir) => EventAnalytics.cohortRetention(
      Tables.load(spark, dir, "events")),
    Some("""WITH fu AS (SELECT user_id,
            CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
          FROM events GROUP BY user_id),
        act AS (SELECT DISTINCT user_id,
            CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk FROM events),
        cells AS (SELECT f.cohort_week,
            CAST(date_diff('day', f.cohort_week, a.wk) / 7 AS INTEGER) AS week_offset,
            COUNT(*) AS n_active
          FROM act a JOIN fu f USING (user_id) GROUP BY 1, 2)
      SELECT cohort_week, week_offset, n_active,
        CAST(n_active AS DOUBLE) /
          MAX(CASE WHEN week_offset = 0 THEN n_active END)
            OVER (PARTITION BY cohort_week) AS retention
      FROM cells""")
  )

  /** First-order event-type transition matrix. The lag runs over the same
    * deterministic (ts, event_id) order in both engines; the probability
    * denominator is pinned back to BIGINT before the one exact division
    * (DuckDB window SUM widens to HUGEINT — the q82 lesson). */
  val q97 = Q(
    "q97_event_transitions",
    (spark, dir) => EventAnalytics.transitionMatrix(
      Tables.load(spark, dir, "events")),
    Some("""WITH s AS (SELECT user_id, event_type,
            LAG(event_type) OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS from_type
          FROM events),
        c AS (SELECT from_type, event_type AS to_type, COUNT(*) AS n
          FROM s WHERE from_type IS NOT NULL GROUP BY 1, 2)
      SELECT from_type, to_type, n,
        CAST(n AS DOUBLE) /
          CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS prob
      FROM c""")
  )

  /** Last-touch attribution: views in the hour before each purchase. COUNT
    * over the left join's possibly-NULL source column is BIGINT in both
    * engines; MAX(ts) is NULL for unattributed purchases in both. */
  val q98 = Q(
    "q98_purchase_attribution",
    (spark, dir) => EventAnalytics.attributionCounts(
      Tables.load(spark, dir, "events"),
      target = "purchase", source = "view", windowMinutes = 60),
    Some("""SELECT p.event_id, p.ts,
        COUNT(v.s_ts) AS n_source, MAX(v.s_ts) AS last_source_ts
      FROM (SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'purchase') p
      LEFT JOIN (SELECT user_id, ts AS s_ts FROM events
            WHERE event_type = 'view') v
        ON v.user_id = p.user_id AND v.s_ts < p.ts
          AND v.s_ts >= p.ts - INTERVAL 60 MINUTE
      GROUP BY 1, 2""")
  )

  /** Zero-filled hourly series per event type. Spark's `sequence` and
    * DuckDB's `generate_series` are both end-inclusive with an exact
    * 1-hour step over µs timestamps; the grid join's fill value is a
    * BIGINT 0 in both engines. The oracle uses the SCALAR-list
    * `unnest(generate_series(...))` form: DuckDB's table-function form
    * rejects both lateral column refs (r6's binder error) and subquery
    * parameters, but the scalar form takes the bounds as plain columns
    * from the 1-row `b` cross join. */
  val q99 = Q(
    "q99_dense_hourly",
    (spark, dir) => EventAnalytics.denseHourlyCounts(
      Tables.load(spark, dir, "events")),
    Some("""WITH b AS (SELECT date_trunc('hour', MIN(ts)) AS h0,
            date_trunc('hour', MAX(ts)) AS h1 FROM events),
        k AS (SELECT DISTINCT event_type FROM events),
        grid AS (SELECT k.event_type,
            unnest(generate_series(b.h0, b.h1, INTERVAL 1 HOUR)) AS hour
          FROM k, b),
        c AS (SELECT event_type, date_trunc('hour', ts) AS hour,
            COUNT(*) AS n
          FROM events GROUP BY 1, 2)
      SELECT grid.event_type, grid.hour,
        COALESCE(c.n, CAST(0 AS BIGINT)) AS n_events
      FROM grid LEFT JOIN c
        ON grid.event_type = c.event_type AND grid.hour = c.hour""")
  )

  /** Per-type z-score outliers (|z| > 3, population σ). μ and E[x²] ride
    * the DECIMAL(28,10) sum + VARCHAR-routed double cast ([[Exact.sqlSum]]);
    * from there every step — subtract, multiply, sqrt, divide, compare —
    * is one correctly-rounded IEEE op evaluated identically by both
    * engines, so even the >3 classification boundary agrees bit-for-bit.
    * Both sides clamp the variance at 0 and NULL a σ = 0 denominator
    * (near-constant groups: the decimal-rounded E[x²] can dip below μ²,
    * where DuckDB sqrt hard-errors and Spark NaN-flags — the clamp makes
    * degenerate groups flag nothing in BOTH engines). */
  val q100 = Q(
    "q100_value_outliers",
    (spark, dir) => EventAnalytics.valueOutliers(
      Tables.load(spark, dir, "events")),
    Some(s"""WITH st AS (SELECT event_type,
          ${Exact.sqlSum("value")} / COUNT(value) AS mu,
          ${Exact.sqlSum("value * value")} / COUNT(value) AS ex2
        FROM events GROUP BY event_type)
      SELECT e.event_id, e.event_type, e.value,
        (e.value - st.mu) /
          NULLIF(sqrt(greatest(st.ex2 - st.mu * st.mu, 0)), 0) AS z
      FROM events e JOIN st USING (event_type)
      WHERE abs((e.value - st.mu) /
        NULLIF(sqrt(greatest(st.ex2 - st.mu * st.mu, 0)), 0)) > 3.0""")
  )

  /** Stage-to-stage dwell-time percentiles for the q94 funnel
    * ([[EventAnalytics.funnelDwellPercentiles]]). Both engines resolve the
    * identical greedy-earliest chain (q94's CTE ladder), difference the
    * binds to BIGINT µs, and pick nearest-rank order statistics
    * (smallest dwell with cumulative count ≥ ceil(p·n)) — every output an
    * integer present in the data, no interpolation, hash-exact. The
    * oracle's window SUM widens to HUGEINT, so n_users pins back to
    * BIGINT (the q82 lesson). */
  val q103 = Q(
    "q103_funnel_dwell",
    (spark, dir) => EventAnalytics.funnelDwellPercentiles(
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
      d AS (
        SELECT CAST(2 AS INTEGER) AS stage_idx, 'view' AS stage_from,
          'click' AS stage_to, epoch_us(t1) - epoch_us(t0) AS dwell_us
        FROM s2 WHERE t1 IS NOT NULL
        UNION ALL
        SELECT CAST(3 AS INTEGER), 'click', 'purchase',
          epoch_us(t2) - epoch_us(t1)
        FROM s2 WHERE t2 IS NOT NULL),
      h AS (SELECT stage_idx, stage_from, stage_to, dwell_us, COUNT(*) AS c
        FROM d GROUP BY 1, 2, 3, 4),
      w AS (SELECT *,
          SUM(c) OVER (PARTITION BY stage_idx ORDER BY dwell_us) AS cum,
          SUM(c) OVER (PARTITION BY stage_idx) AS n
        FROM h)
      SELECT stage_idx, stage_from, stage_to,
        CAST(MAX(n) AS BIGINT) AS n_users,
        MIN(CASE WHEN cum >= ceil(0.5 * n) THEN dwell_us END) AS p50_us,
        MIN(CASE WHEN cum >= ceil(0.9 * n) THEN dwell_us END) AS p90_us,
        MIN(CASE WHEN cum >= ceil(0.99 * n) THEN dwell_us END) AS p99_us
      FROM w GROUP BY 1, 2, 3""")
  )

  /** Batch gap-based sessionization ([[EventAnalytics.sessionize]]) —
    * verified against the SAME gaps-and-islands oracle as the streaming
    * sessionizers (q59 Complete, q65 Append, q104 multi-batch), pinning
    * the backfill/live parity claim: one session contract, four verified
    * paths. */
  val q105 = Q(
    "q105_batch_sessionize",
    (spark, dir) => EventAnalytics.sessionize(
      Tables.load(spark, dir, "events"), gapMinutes = 30),
    Some(ParityQueries.sessionsOracle)
  )

  /** SCD Type-2 dimension build ([[EventAnalytics.scd2Intervals]]): each
    * user's event_type history collapsed into versioned half-open
    * validity intervals. The oracle mirrors the run-collapse lag + lead +
    * row_number over the identical total order (ts, event_id), so
    * interval bounds, versions, and the is_current flag all hash-check;
    * timestamps ride the µs-parity contract the other event queries
    * use. */
  val q134 = Q(
    "q134_scd2_intervals",
    (spark, dir) =>
      EventAnalytics.scd2Intervals(Tables.load(spark, dir, "events")),
    Some("""WITH o AS (
        SELECT user_id, event_type, ts, event_id,
          lag(event_type) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS prev
        FROM events),
      c AS (SELECT user_id, event_type, ts, event_id FROM o
            WHERE prev IS NULL OR prev <> event_type)
      SELECT user_id, event_type AS attr, ts AS valid_from,
        lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          AS valid_to,
        CAST(ROW_NUMBER() OVER (PARTITION BY user_id
          ORDER BY ts, event_id) AS INTEGER) AS version,
        lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
          AS is_current
      FROM c""")
  )

  /** Session concurrency via the bucketed interval-overlap join
    * ([[graft.operators.IntervalJoin.overlapCounts]] over q105's session
    * intervals, 1-hour buckets): for every session, how many OTHER
    * sessions (any user) overlap it in time. The oracle recounts with
    * the NAIVE n² range self-join — shape-independent of the bucketed
    * plan, so bucket-boundary handling (half-open ends, the
    * first-shared-bucket pair dedup) is falsifiable, not assumed. */
  val q143 = Q(
    "q143_session_overlap",
    (spark, dir) => graft.operators.IntervalJoin.overlapCounts(
      EventAnalytics.sessionize(Tables.load(spark, dir, "events"),
        gapMinutes = 30),
      idCols = Seq("user_id", "session_start"),
      startCol = "session_start", endCol = "session_end"),
    Some("""WITH o AS (
        SELECT user_id, ts,
          CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                 OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                      >= INTERVAL '30 minutes'
               THEN 1 ELSE 0 END AS brk
        FROM events),
      g AS (
        SELECT user_id, ts,
          SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                         ROWS UNBOUNDED PRECEDING) AS grp
        FROM o),
      sess AS (
        SELECT user_id, MIN(ts) AS session_start,
          MAX(ts) + INTERVAL '30 minutes' AS session_end
        FROM g GROUP BY user_id, grp)
      SELECT s1.user_id, s1.session_start, s1.session_end,
        COUNT(s2.user_id) AS n_overlaps
      FROM sess s1 LEFT JOIN sess s2
        ON NOT (s2.user_id = s1.user_id
                AND s2.session_start = s1.session_start)
          AND s1.session_start < s2.session_end
          AND s2.session_start < s1.session_end
      GROUP BY 1, 2, 3""")
  )

  /** Session-basket association rules
    * ([[EventAnalytics.basketPairAssociations]]): distinct-event-type
    * baskets per 30-minute session, pairwise co-occurrence with both
    * confidences and lift in integer micros. The oracle rebuilds baskets
    * from the same gaps-and-islands ladder and mirrors the exact product/
    * division/round order. */
  val q144 = Q(
    "q144_event_associations",
    (spark, dir) => EventAnalytics.basketPairAssociations(
      Tables.load(spark, dir, "events"), gapMinutes = 30),
    Some("""WITH o AS (
        SELECT user_id, ts, event_type,
          CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                 OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                      >= INTERVAL '30 minutes'
               THEN 1 ELSE 0 END AS brk
        FROM events),
      g AS (
        SELECT user_id, event_type,
          SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                         ROWS UNBOUNDED PRECEDING) AS grp
        FROM o),
      it AS (SELECT DISTINCT user_id, grp, event_type FROM g),
      nb AS (SELECT COUNT(*) AS n_baskets
             FROM (SELECT DISTINCT user_id, grp FROM it)),
      ic AS (SELECT event_type, COUNT(*) AS c FROM it GROUP BY 1),
      pr AS (
        SELECT a.event_type AS item_a, b.event_type AS item_b,
          COUNT(*) AS c_both
        FROM it a JOIN it b
          ON a.user_id = b.user_id AND a.grp = b.grp
            AND a.event_type < b.event_type
        GROUP BY 1, 2)
      SELECT item_a, item_b, nb.n_baskets, ca.c AS c_a, cb.c AS c_b, c_both,
        CAST(ROUND(1000000.0 * (nb.n_baskets * c_both) / (ca.c * cb.c))
          AS BIGINT) AS lift_1e6,
        CAST(ROUND(1000000.0 * c_both / ca.c) AS BIGINT) AS conf_a_b_1e6,
        CAST(ROUND(1000000.0 * c_both / cb.c) AS BIGINT) AS conf_b_a_1e6
      FROM pr, nb
        JOIN ic ca ON ca.event_type = pr.item_a
        JOIN ic cb ON cb.event_type = pr.item_b""")
  )

  /** Robust MAD outliers ([[EventAnalytics.madOutliers]]): the
    * median/MAD modified z-score twin of q100's moment-based screen. The
    * oracle rebuilds both exact nearest-rank medians through the same
    * histogram-window ladder and mirrors the fixed score op order, with
    * the MAD = 0 NULL guard on both sides. */
  val q146 = Q(
    "q146_mad_outliers",
    (spark, dir) => EventAnalytics.madOutliers(
      Tables.load(spark, dir, "events"), threshold = 3.5),
    Some("""WITH h AS (
        SELECT event_type, value, COUNT(*) AS c FROM events GROUP BY 1, 2),
      w AS (SELECT *,
          SUM(c) OVER (PARTITION BY event_type ORDER BY value) AS cum,
          SUM(c) OVER (PARTITION BY event_type) AS n
        FROM h),
      med AS (
        SELECT event_type,
          MIN(CASE WHEN cum >= ceil(0.5 * n) THEN value END) AS med
        FROM w GROUP BY 1),
      dh AS (
        SELECT e.event_type, abs(e.value - m.med) AS dev, COUNT(*) AS c
        FROM events e JOIN med m USING (event_type) GROUP BY 1, 2),
      dw AS (SELECT *,
          SUM(c) OVER (PARTITION BY event_type ORDER BY dev) AS cum,
          SUM(c) OVER (PARTITION BY event_type) AS n
        FROM dh),
      mad AS (
        SELECT event_type,
          MIN(CASE WHEN cum >= ceil(0.5 * n) THEN dev END) AS mad
        FROM dw GROUP BY 1)
      SELECT e.event_id, e.event_type, e.value,
        CAST(0.6745 AS DOUBLE) * (e.value - m.med)
          / (CASE WHEN d.mad > 0.0 THEN d.mad END) AS mz
      FROM events e
        JOIN med m USING (event_type)
        JOIN mad d USING (event_type)
      WHERE abs(CAST(0.6745 AS DOUBLE) * (e.value - m.med)
          / (CASE WHEN d.mad > 0.0 THEN d.mad END)) > 3.5""")
  )

  val all: Seq[Q] =
    Seq(q94, q95, q96, q97, q98, q99, q100, q103, q105, q134, q143, q144,
      q146)
}
