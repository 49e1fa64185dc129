package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType}

/** Event-log analytics: ordered funnel completion and time-decayed
  * engagement aggregation — the behavioral-reporting pair next to the
  * sessionization operators in `streaming/EventsStream`. Both are
  * single-shuffle shapes: everything per-user happens row-locally after
  * one partial-aggregated exchange on the user key.
  */
object EventAnalytics {

  /** Ordered funnel: how many users complete stage 1, then stage 2
    * STRICTLY AFTER their first stage-1 event, then stage 3 strictly
    * after that, … Earliest-completion semantics: each stage binds to the
    * earliest event that still satisfies the ordering, so a user counts
    * for stage i iff ANY chain of strictly-increasing timestamps through
    * stages 1..i exists (greedy-earliest is optimal here: taking the
    * earliest valid event at each stage dominates any other choice).
    *
    * Output: one row per stage — (stage_idx 1-based, stage, n_users,
    * conv_from_first, conv_from_prev), conversions null only on an empty
    * funnel head.
    *
    * Shape at scale: ONE shuffle — events filtered to the stage set
    * (pushed to the scan), grouped by user with per-stage sorted
    * timestamp arrays collected map-side; per-user chain resolution is a
    * row-local walk over those arrays (`filter` + `element_at`, null
    * propagation gives the strictly-after semantics for free: a missing
    * prior stage nulls the comparison, which empties the filter). State
    * per user is bounded by that user's event count — the same per-key
    * bound the session operators carry. The final stage-count aggregate
    * is a single all-null-key reduce emitting `stages.length` rows. */
  /** Per-user greedy-earliest chain resolution shared by [[funnel]] and
    * [[funnelDwellPercentiles]]: one shuffle to per-user sorted stage
    * arrays, then a row-local walk binding each stage to the earliest
    * event strictly after the previous stage's bind. Emits one row per
    * user with nullable bind timestamps t0..t{k−1}. */
  private def chainTimes(events: DataFrame, stages: Seq[String],
      typeCol: String, userCol: String, tsCol: String): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct == stages, s"duplicate stage in $stages")
    val arrays = stages.zipWithIndex.map { case (s, i) =>
      sort_array(collect_list(when(col(typeCol) === s, col(tsCol))))
        .as(s"a$i")
    }
    val perUser = events
      .filter(col(typeCol).isin(stages: _*))
      .groupBy(col(userCol))
      .agg(arrays.head, arrays.tail: _*)
    stages.indices.foldLeft(perUser) { (df, i) =>
      if (i == 0) df.withColumn("t0", element_at(col("a0"), 1))
      else df.withColumn(s"t$i",
        element_at(filter(col(s"a$i"), x => x > col(s"t${i - 1}")), 1))
    }
  }

  def funnel(events: DataFrame, stages: Seq[String],
      typeCol: String = "event_type", userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val withTimes = chainTimes(events, stages, typeCol, userCol, tsCol)
    val counts = withTimes.agg(
      count(col("t0")).as("n0"),
      stages.indices.tail.map(i => count(col(s"t$i")).as(s"n$i")): _*)
    counts.select(explode(array(stages.indices.map { i =>
      struct(
        lit(i + 1).as("stage_idx"),
        lit(stages(i)).as("stage"),
        col(s"n$i").as("n_users"),
        when(col("n0") > 0, col(s"n$i").cast(DoubleType) / col("n0"))
          .as("conv_from_first"),
        (if (i == 0) when(col("n0") > 0, lit(1.0))
         else when(col(s"n${i - 1}") > 0,
           col(s"n$i").cast(DoubleType) / col(s"n${i - 1}")))
          .as("conv_from_prev"))
    }: _*)).as("s")).select("s.*")
  }

  /** Stage-to-stage dwell-time distributions for an ordered funnel: for
    * every consecutive stage pair, the exact nearest-rank percentiles of
    * `t_i − t_{i−1}` (µs) across users who completed stage i under
    * [[funnel]]'s greedy-earliest chain semantics. The "how long do users
    * sit between click and purchase" report next to the completion counts.
    *
    * Exactness: dwell times are BIGINT µs differences; a percentile is the
    * nearest-rank order statistic — the smallest dwell whose cumulative
    * count reaches `ceil(p·n)` — so every output is an integer actually
    * present in the data, hash-checkable with no interpolation or
    * floating-point tie-break (the [[graft.queries.Exact]] discipline).
    *
    * Shape at scale: the per-user chain is [[funnel]]'s ONE user-key
    * shuffle; dwell rows (#users × (stages−1)) then compress via a
    * partial-aggregated groupBy into a per-(stage, dwell) HISTOGRAM before
    * any ordering, so the per-stage cumulative window sorts distinct
    * values with multiplicities, not raw rows — the same
    * compress-then-rank move as the vocabulary ranking. The final
    * percentile pick is a per-stage aggregate over that histogram. */
  def funnelDwellPercentiles(events: DataFrame, stages: Seq[String],
      percentiles: Seq[Double] = Seq(0.5, 0.9, 0.99),
      typeCol: String = "event_type", userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    require(stages.size >= 2, "dwell needs at least two stages")
    require(percentiles.nonEmpty &&
      percentiles.forall(p => p > 0 && p <= 1), s"percentiles=$percentiles")
    Quantiles.requireDistinctLabels(percentiles)
    val withTimes = chainTimes(events, stages, typeCol, userCol, tsCol)
    val pairs = stages.indices.tail.map { i =>
      struct(
        lit(i + 1).as("stage_idx"),
        lit(stages(i - 1)).as("stage_from"),
        lit(stages(i)).as("stage_to"),
        (unix_micros(col(s"t$i")) - unix_micros(col(s"t${i - 1}")))
          .as("dwell_us"))
    }
    val hist = withTimes
      .select(explode(array(pairs: _*)).as("p")).select("p.*")
      .filter(col("dwell_us").isNotNull)
      .groupBy(col("stage_idx"), col("stage_from"), col("stage_to"),
        col("dwell_us"))
      .agg(count(lit(1)).as("c"))
    val byStage = Window.partitionBy(col("stage_idx"))
    val cum = byStage.orderBy(col("dwell_us"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = hist
      .withColumn("cum", sum(col("c")).over(cum))
      .withColumn("n", sum(col("c")).over(byStage))
    val picks = percentiles.map { p =>
      min(when(col("cum") >= ceil(lit(p) * col("n")), col("dwell_us")))
        .as(s"${Quantiles.pLabel(p)}_us")
    }
    ranked.groupBy(col("stage_idx"), col("stage_from"), col("stage_to"))
      .agg(max(col("n")).as("n_users"), picks: _*)
  }

  /** Batch gap-based sessionization — the batch/backfill twin of the
    * streaming sessionizer (`graft.streaming.EventsStream.sessionCounts`),
    * emitting the SAME output contract: (session_start, session_end =
    * last event + gap, user_id, n_events, decimal-exact total_value). One
    * engine for the live stream and its historical backfill means session
    * boundaries can never disagree between the two paths — the property
    * q59/q65/q104 verify from the streaming side and q105 from this side,
    * all against one gaps-and-islands oracle.
    *
    * Semantics: a session BREAKS when the inter-event gap is ≥ `gap`
    * (strictly-less keeps the session alive — matching Spark's
    * session-window close, whose window is [start, last + gap)). The
    * comparison runs on exact BIGINT µs differences.
    *
    * Shape at scale: ONE user-key shuffle. The lag, the running break
    * sum, and the (user, session) aggregate all share the same user-key
    * partitioning (the window sort is per-partition work, and the groupBy
    * keys extend the window's partition key), so Catalyst plans a single
    * exchange — the same bound the streaming sessionizer's state shuffle
    * carries. */
  /** The gaps-and-islands session-id ladder shared by [[sessionize]] and
    * [[basketPairAssociations]]: the input columns plus a per-user `grp`
    * session ordinal (break on inter-event gap ≥ `gapMinutes`). ONE
    * exchange on the user key; keeping it single-sourced means a change
    * to the gap rule (boundary inclusivity, µs conversion) cannot
    * silently diverge the two consumers — whose oracles share the same
    * SQL ladder. */
  private def sessionGroups(events: DataFrame, gapMinutes: Int,
      userCol: String, tsCol: String, carryCols: Seq[String]): DataFrame = {
    require(gapMinutes >= 1, s"gapMinutes=$gapMinutes")
    val gapUs = gapMinutes * 60L * 1000000L
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(unix_micros(col(tsCol)), 1).over(w)
    val brk = when(
      prev.isNull || unix_micros(col(tsCol)) - prev >= gapUs, 1L)
      .otherwise(0L)
    events
      .select((userCol +: tsCol +: carryCols).map(col): _*)
      .withColumn("grp", sum(brk).over(run))
  }

  def sessionize(events: DataFrame, gapMinutes: Int = 30,
      userCol: String = "user_id", tsCol: String = "ts",
      valueCol: String = "value"): DataFrame = {
    import graft.queries.Exact
    sessionGroups(events, gapMinutes, userCol, tsCol, Seq(valueCol))
      .groupBy(col(userCol), col("grp"))
      .agg(
        min(col(tsCol)).as("session_start"),
        (max(col(tsCol)) + expr(s"INTERVAL $gapMinutes MINUTES"))
          .as("session_end"),
        count(lit(1)).as("n_events"),
        Exact.dsum(col(valueCol)).as("total_value"))
      .select(col("session_start"), col("session_end"), col(userCol),
        col("n_events"), col("total_value"))
  }

  /** Per-user time-decayed value total: each event contributes
    * `value · 2^-⌊age / halfLifeDays⌋`, age measured in days back from
    * the NEWEST event in the log (an in-plan anchor — no wall clock, so
    * results are reproducible and cross-engine checkable). The recency
    * weighting behind "current engagement" scores and decayed sampling
    * priorities.
    *
    * Exactness by construction: the decay exponent is an INTEGER bucket
    * count, so the weight is an exact power of two (any IEEE pow is
    * exact on those up to 2^-1074, below which both engines flush to 0
    * identically); the bucket itself is a floor over one double
    * division both engines evaluate identically; and the weighted sum
    * runs through DECIMAL(28,10) — the library-wide [[graft.queries.Exact]]
    * discipline — so the total is partition-order-independent, not just
    * approximately stable.
    *
    * Shape at scale: anchor closes via a broadcast 1-row cross join (no
    * driver action), weights are row-local, and the per-user total is
    * ONE partial-aggregated shuffle. */
  def decayedSum(events: DataFrame, halfLifeDays: Int,
      userCol: String = "user_id", tsCol: String = "ts",
      valueCol: String = "value"): DataFrame = {
    require(halfLifeDays >= 1, s"halfLifeDays=$halfLifeDays")
    val anchor = events.agg(max(unix_micros(col(tsCol))).as("anchor_us"))
    val bucketUs = lit(86400000000.0 * halfLifeDays)
    events.crossJoin(broadcast(anchor))
      .select(col(userCol),
        floor((col("anchor_us") - unix_micros(col(tsCol))) / bucketUs)
          .as("buckets"),
        col(valueCol))
      .groupBy(col(userCol))
      .agg(count(lit(1)).as("n_events"),
        sum((col(valueCol) * pow(lit(2.0), -col("buckets")))
          .cast(DecimalType(28, 10))).cast(DoubleType).as("decayed_value"))
  }

  /** Weekly cohort retention: users are assigned to the ISO week of their
    * FIRST event; for every (cohort, week-offset) cell, how many of that
    * cohort's users were active, and what fraction of the cohort that is.
    * The canonical "do users come back" report.
    *
    * Shape at scale: ONE wide shuffle. Per user, a single partial-aggregated
    * groupBy collects both the first-event timestamp and the DISTINCT set of
    * active weeks (bounded: ≤ weeks-in-corpus per user, collected map-side),
    * so the raw event volume is reduced before the exchange. The
    * (cohort, offset) re-aggregation and the cohort-size window both run on
    * #cohorts × #weeks rows — reporting-table sized, irrelevant at any SF.
    * No join back to the event log.
    *
    * Retention is a single exact division of two BIGINT counts; the offset
    * is an exact integer (week-truncated timestamps differ by whole
    * multiples of 7 days, so `datediff/7` is exact before the int cast). */
  def cohortRetention(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val wk = date_trunc("week", col(tsCol))
    val perUser = events.groupBy(col(userCol))
      .agg(date_trunc("week", min(col(tsCol))).as("cohort_week"),
        collect_set(wk).as("weeks"))
    val cells = perUser
      .select(col("cohort_week"), explode(col("weeks")).as("wk"))
      .select(col("cohort_week"),
        (datediff(col("wk"), col("cohort_week")) / 7)
          .cast(IntegerType).as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_active"))
    val cohortSize = Window.partitionBy(col("cohort_week"))
    cells.select(col("cohort_week"), col("week_offset"), col("n_active"),
      (col("n_active").cast(DoubleType) /
        max(when(col("week_offset") === 0, col("n_active")))
          .over(cohortSize)).as("retention"))
  }

  /** First-order (Markov) transition matrix over each user's event-type
    * sequence: counts and row-normalized probabilities for every observed
    * (from_type, to_type) adjacency. Orders strictly by (ts, event id) so
    * ties are deterministic and cross-engine reproducible.
    *
    * Shape at scale: the lag window is ONE shuffle on the user key with
    * per-user sort — the same exchange any per-user sequence operator pays
    * (sessionize, funnel) — then the pair counts collapse to at most
    * |types|² rows via a partial-aggregated groupBy. The probability
    * normalization is a window over that tiny matrix. Per-user state in the
    * window is one row of look-behind, not the whole sequence. */
  def transitionMatrix(events: DataFrame, userCol: String = "user_id",
      typeCol: String = "event_type", tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    val seq = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val pairs = events
      .select(col(userCol), col(typeCol), col(tsCol), col(idCol))
      .withColumn("from_type", lag(col(typeCol), 1).over(seq))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
    val row = Window.partitionBy(col("from_type"))
    pairs.select(col("from_type"), col("to_type"), col("n"),
      (col("n").cast(DoubleType) / sum(col("n")).over(row)).as("prob"))
  }

  /** Last-touch attribution counting: for every `target` event, how many
    * `source` events the same user produced in the strictly-preceding
    * window `[ts − windowMinutes, ts)`, and when the latest one was (NULL
    * when unattributed). The "views before purchase" shape.
    *
    * Shape at scale: an EQUI-join on the user key (sort-merge, both sides'
    * type filters pushed to the parquet scan) with the time-range predicate
    * evaluated as a join residual — never a cross product, because the user
    * key partitions the space; per-user pair work is bounded by per-user
    * event counts, the same bound every per-user operator here carries. A
    * LEFT join keeps zero-source targets with an honest 0/NULL. */
  def attributionCounts(events: DataFrame, target: String, source: String,
      windowMinutes: Int, userCol: String = "user_id",
      typeCol: String = "event_type", tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    require(windowMinutes >= 1, s"windowMinutes=$windowMinutes")
    val t = events.filter(col(typeCol) === target)
      .select(col(idCol), col(userCol), col(tsCol))
    val s = events.filter(col(typeCol) === source)
      .select(col(userCol).as("s_user"), col(tsCol).as("s_ts"))
    t.join(s,
        col(userCol) === col("s_user") &&
          col("s_ts") < col(tsCol) &&
          col("s_ts") >= col(tsCol) - expr(s"INTERVAL $windowMinutes MINUTES"),
        "left")
      .groupBy(col(idCol), col(tsCol))
      .agg(count(col("s_ts")).as("n_source"),
        max(col("s_ts")).as("last_source_ts"))
  }

  /** Zero-filled hourly activity series per key: every (key, hour) cell in
    * the corpus' global hour span gets a row, with 0 where nothing
    * happened — the gap-fill / densification step charting and
    * stream-backfill jobs need (a sparse groupBy output silently skips
    * empty hours).
    *
    * Shape at scale: the hour span closes via a broadcast 1-row aggregate
    * (no driver action); the dense frame is keys × `sequence(h0, h1)`
    * exploded — generated, not shuffled, and sized #keys × #hours, a
    * reporting grid orders of magnitude below the event volume it
    * describes. The observed counts arrive from ONE partial-aggregated
    * shuffle and meet the grid in a join on (key, hour). */
  def denseHourlyCounts(events: DataFrame, keyCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    val hr = date_trunc("hour", col(tsCol))
    val bounds = events.agg(date_trunc("hour", min(col(tsCol))).as("h0"),
      date_trunc("hour", max(col(tsCol))).as("h1"))
    val grid = events.select(col(keyCol)).distinct()
      .crossJoin(broadcast(bounds))
      .select(col(keyCol),
        explode(sequence(col("h0"), col("h1"),
          expr("INTERVAL 1 HOUR"))).as("hour"))
    val observed = events
      .groupBy(col(keyCol), hr.as("hour"))
      .agg(count(lit(1)).as("n"))
    grid.join(observed, Seq(keyCol, "hour"), "left")
      .select(col(keyCol), col("hour"),
        coalesce(col("n"), lit(0L)).as("n_events"))
  }

  /** Per-group z-score outliers: events whose value sits more than
    * `threshold` population standard deviations from their group's mean.
    * The cheap distribution-based anomaly screen run before expensive
    * per-record inspection.
    *
    * Exactness: mean and E[x²] go through the library's DECIMAL(28,10) sum
    * discipline ([[graft.queries.Exact]]) so they are partition-order
    * independent; variance is then `E[x²] − μ²` and the z-score one
    * subtraction, one division, one IEEE-exact sqrt — every step a single
    * correctly-rounded double op both engines evaluate identically (the
    * q95 precedent: double·double products cast to DECIMAL(28,10) agree
    * cross-engine on this corpus).
    *
    * Shape at scale: one partial-aggregated groupBy to #groups stat rows,
    * broadcast back onto the stream — no window over raw events, no second
    * wide shuffle. Degenerate groups flag nothing DETERMINISTICALLY: the
    * variance is clamped at zero (`greatest(E[x²] − μ², 0)` — the rounded
    * decimal E[x²] can dip a hair below μ² for near-constant groups, where
    * DuckDB's sqrt would hard-error and Spark's would NaN-flag every row)
    * and a σ = 0 denominator is NULLed before the division, so both
    * engines agree even on constant groups. */
  def valueOutliers(events: DataFrame, threshold: Double = 3.0,
      keyCol: String = "event_type", valueCol: String = "value",
      idCol: String = "event_id"): DataFrame = {
    import graft.queries.Exact
    val stats = events.groupBy(col(keyCol)).agg(
      (Exact.dsum(col(valueCol)) / count(col(valueCol))).as("mu"),
      (Exact.dsum(col(valueCol) * col(valueCol)) / count(col(valueCol)))
        .as("ex2"))
    val sigma =
      sqrt(greatest(col("ex2") - col("mu") * col("mu"), lit(0.0)))
    val z = (col(valueCol) - col("mu")) / when(sigma > 0, sigma)
    events.join(broadcast(stats), Seq(keyCol))
      .select(col(idCol), col(keyCol), col(valueCol), z.as("z"))
      .filter(abs(col("z")) > threshold)
  }

  /** ROBUST per-group outliers by modified z-score: median/MAD instead of
    * mean/σ — the Iglewicz–Hoaglin screen, immune to the masking that
    * makes [[valueOutliers]]'s moment statistics miss outliers in
    * heavy-tailed telemetry (one huge value inflates σ enough to hide
    * the rest; it cannot move the median). Flags rows with
    * |0.6745·(x − med)/MAD| > threshold; MAD = 0 groups (over half the
    * group constant) flag nothing, deterministically, via a NULLed
    * denominator — the q100 degenerate-group discipline.
    *
    * Exactness: median and MAD are exact nearest-rank DATA VALUES from
    * [[Quantiles.exactGroupQuantiles]]' compress-then-rank histograms (no
    * interpolation, no FP aggregation), and the score is a fixed
    * subtract/multiply/divide sequence both engines evaluate identically.
    *
    * Shape at scale: two compress-then-rank passes (values, then absolute
    * deviations — each sorts the value DOMAIN, not rows), each median
    * relation broadcast back onto the stream; no window over raw events,
    * no second corpus shuffle beyond the two histograms. */
  def madOutliers(events: DataFrame, threshold: Double = 3.5,
      keyCol: String = "event_type", valueCol: String = "value",
      idCol: String = "event_id"): DataFrame = {
    val med = Quantiles.exactGroupQuantiles(
      events.select(col(keyCol), col(valueCol)), keyCol, valueCol, Seq(0.5))
      .select(col(keyCol), col("p50").as("med"))
    val devs = events.join(broadcast(med), Seq(keyCol))
      .select(col(keyCol), abs(col(valueCol) - col("med")).as("dev"))
    val mad = Quantiles.exactGroupQuantiles(devs, keyCol, "dev", Seq(0.5))
      .select(col(keyCol), col("p50").as("mad"))
    val mz = lit(0.6745) * (col(valueCol) - col("med")) /
      when(col("mad") > 0.0, col("mad"))
    events.join(broadcast(med), Seq(keyCol))
      .join(broadcast(mad), Seq(keyCol))
      .select(col(idCol), col(keyCol), col(valueCol), mz.as("mz"))
      .filter(abs(col("mz")) > threshold)
  }

  /** Market-basket pair associations over SESSION baskets: each
    * gaps-and-islands session (the [[sessionize]] grouping) is a basket
    * of the DISTINCT event types it contains; for every type pair a<b the
    * operator reports co-occurrence, both directed confidences, and lift
    * — the association-rule layer of behavioral analytics ("users who X
    * in a session also Y").
    *
    * Exactness: counts are BIGINT; lift = 10⁶·(N·c_ab)/(c_a·c_b) and the
    * confidences are single double divisions of exact integer products,
    * rounded to integer micros (the q93 discipline; the products stay
    * well inside 2⁵³ for any basket corpus that fits an engine — beyond
    * that, swap the cast to DECIMAL).
    *
    * Shape at scale: one user-key exchange builds baskets (the q105
    * sessionize shuffle); the distinct item relation is baskets ×
    * item-domain — domain-BOUNDED, so the within-basket pair self-join is
    * quadratic only in the small per-basket domain; item counts and the
    * basket total are tiny broadcast relations. No corpus-sized join
    * anywhere. */
  def basketPairAssociations(events: DataFrame, gapMinutes: Int = 30,
      userCol: String = "user_id", tsCol: String = "ts",
      itemCol: String = "event_type"): DataFrame = {
    // pinned: the basket item relation (baskets × bounded item domain)
    // feeds the pair self-join (twice), the item counts, and the basket
    // total — unpinned, each consumer replays the corpus window pass
    val items = sessionGroups(events, gapMinutes, userCol, tsCol, Seq(itemCol))
      .select(col(userCol), col("grp"), col(itemCol)).distinct()
      .localCheckpoint()
    val nBaskets = items.select(col(userCol), col("grp")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val itemCounts = items.groupBy(col(itemCol)).agg(count(lit(1)).as("c"))
    val pairs = items.as("a")
      .join(items.as("b"),
        col(s"a.$userCol") === col(s"b.$userCol") &&
          col("a.grp") === col("b.grp") &&
          col(s"a.$itemCol") < col(s"b.$itemCol"))
      .groupBy(col(s"a.$itemCol").as("item_a"),
        col(s"b.$itemCol").as("item_b"))
      .agg(count(lit(1)).as("c_both"))
    pairs
      .join(broadcast(itemCounts.select(col(itemCol).as("item_a"),
        col("c").as("c_a"))), "item_a")
      .join(broadcast(itemCounts.select(col(itemCol).as("item_b"),
        col("c").as("c_b"))), "item_b")
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_baskets"),
        col("c_a"), col("c_b"), col("c_both"),
        round(lit(1e6) * (col("n_baskets") * col("c_both"))
          / (col("c_a") * col("c_b"))).cast("long").as("lift_1e6"),
        round(lit(1e6) * col("c_both") / col("c_a")).cast("long")
          .as("conf_a_b_1e6"),
        round(lit(1e6) * col("c_both") / col("c_b")).cast("long")
          .as("conf_b_a_1e6"))
  }

  /** Slowly-Changing-Dimension Type-2 build from an event log: per key,
    * each RUN of consecutive identical attribute values becomes one
    * versioned validity interval — `valid_from` at the run's first event,
    * half-open `valid_to` at the next run's start (NULL on the current
    * run, flagged `is_current`), `version` counting runs from 1. This is
    * the dimension-table maintenance step a warehouse derives from a
    * change stream: collapse repeats, open an interval per change.
    *
    * Shape at scale: one shuffle on the key; the run-collapse lag, the
    * interval-closing lead, and the version row_number all ride the SAME
    * (key, ts, tie) ordering, so Catalyst plans them in one exchange with
    * in-partition sorts — no second wide shuffle, no self-join against
    * the change rows. The tie column makes the order total, so intervals
    * are deterministic even under equal timestamps. */
  def scd2Intervals(events: DataFrame, keyCol: String = "user_id",
      attrCol: String = "event_type", tsCol: String = "ts",
      tieCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    events.select(col(keyCol), col(attrCol), col(tsCol), col(tieCol))
      .withColumn("prev", lag(col(attrCol), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col(attrCol))
      .select(col(keyCol), col(attrCol).as("attr"),
        col(tsCol).as("valid_from"),
        lead(col(tsCol), 1).over(w).as("valid_to"),
        row_number().over(w).cast(IntegerType).as("version"))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
