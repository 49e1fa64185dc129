package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

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
  def funnel(events: DataFrame, stages: Seq[String],
      typeCol: String = "event_type", userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
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
    val withTimes = stages.indices.foldLeft(perUser) { (df, i) =>
      if (i == 0) df.withColumn("t0", element_at(col("a0"), 1))
      else df.withColumn(s"t$i",
        element_at(filter(col(s"a$i"), x => x > col(s"t${i - 1}")), 1))
    }
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
}
