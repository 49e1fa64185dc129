package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** UNKEYED interval-overlap join by time bucketing — the range-join family
  * member the as-of operators ([[AsofJoin]]) don't cover: find interval
  * PAIRS that overlap in time with no equi-key to partition on
  * (concurrency analysis, resource-contention audits, co-occurring
  * session detection).
  *
  * The naive formulation is a full cross join with a range predicate —
  * n² at any scale. The bucketed plan explodes each interval to the
  * fixed-width time buckets it covers and equi-joins on the bucket id, so
  * the join cost is Σ (per-bucket concurrency)² — bounded by how much
  * GENUINE temporal overlap exists, not by corpus size — and the bucket id
  * is a shuffle key that spreads uniformly over time. Each overlapping
  * pair meets in every shared bucket; instead of a post-join `distinct`,
  * the pair is KEPT only in the latest of the two start buckets (the
  * first bucket where both intervals are present), so each pair survives
  * exactly once and the wide distinct disappears.
  *
  * Bucket width is the classic tuning knob: ~the median interval length
  * keeps the explode factor small while the per-bucket population stays
  * thin. All bucket arithmetic is integer µs floor-division — exact. */
object IntervalJoin {

  /** Per-interval count of OTHER intervals overlapping it (half-open
    * [start, end) semantics, strict `<`). `idCols` must uniquely identify
    * an interval; zero-overlap intervals are kept with n_overlaps = 0. */
  def overlapCounts(intervals: DataFrame, idCols: Seq[String],
      startCol: String, endCol: String,
      bucketMicros: Long = 3600L * 1000 * 1000): DataFrame = {
    require(idCols.nonEmpty, "idCols must be non-empty")
    require(bucketMicros > 0, s"bucketMicros=$bucketMicros")
    val iv = intervals.select(struct(idCols.map(col): _*).as("iid"),
      col(startCol).as("s"), col(endCol).as("e"))
    // Degenerate intervals (end <= start) are EMPTY under the half-open
    // contract: they overlap nothing, so they take no part in pair
    // generation (they still surface in the output with n_overlaps = 0
    // via the final left join). The filter is also what keeps
    // sequence(sb, eb) well-formed — with eb < sb Spark generates a
    // DESCENDING sequence, which would explode an empty interval into
    // spurious buckets.
    val nonEmpty = iv.filter(col("s") < col("e"))
    // pinned: the bucket-exploded relation is read twice by the pair
    // self-join; it is intervals × buckets-per-interval — far smaller
    // than whatever corpus the intervals were derived from, so
    // materializing beats replaying the upstream derivation twice
    val exploded = nonEmpty
      .withColumn("sb", expr(s"unix_micros(s) div $bucketMicros"))
      .withColumn("eb", expr(s"(unix_micros(e) - 1) div $bucketMicros"))
      .select(col("iid"), col("s"), col("e"), col("sb"),
        explode(sequence(col("sb"), col("eb"))).as("bk"))
      .localCheckpoint()
    val pairs = exploded.as("x").join(exploded.as("y"),
      col("x.bk") === col("y.bk") &&
        col("x.iid") =!= col("y.iid") &&
        col("x.s") < col("y.e") && col("y.s") < col("x.e") &&
        // keep the pair only in the first bucket both intervals inhabit
        col("x.bk") === greatest(col("x.sb"), col("y.sb")))
      .select(col("x.iid").as("iid"))
    val counts = pairs.groupBy(col("iid")).agg(count(lit(1)).as("n_overlaps"))
    // id columns may include the bound columns; emit each name once
    val bounds = Seq(startCol -> col("s"), endCol -> col("e"))
      .filterNot { case (n, _) => idCols.contains(n) }
      .map { case (n, c) => c.as(n) }
    iv.join(counts, Seq("iid"), "left")
      .select((idCols.map(c => col(s"iid.$c").as(c)) ++ bounds :+
        coalesce(col("n_overlaps"), lit(0L)).as("n_overlaps")): _*)
  }
}
