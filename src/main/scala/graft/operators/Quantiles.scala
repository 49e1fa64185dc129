package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distribution statistics without sketches: nearest-rank order
  * statistics per group, computed scale-safely. The exact sibling of the
  * KLL-ish quantile sketch in the profiling queries — when the value
  * domain compresses (lengths, counts, µs durations, scores), exact
  * quantiles are affordable at any corpus size and hash-checkable
  * cross-engine, which no mergeable sketch is.
  */
object Quantiles {

  /** Column-label stem for percentile p: tenth-of-a-percent precision,
    * trailing zero dropped — 0.5→"p50", 0.99→"p99", 0.995→"p99_5",
    * 0.001→"p0_1". Rounding to per-mille means ps closer than 0.0005
    * still collide, so every caller must also [[requireDistinctLabels]]
    * — a collision would surface as a duplicate output column, an
    * opaque downstream failure. */
  def pLabel(p: Double): String = {
    val mille = math.round(p * 1000)
    if (mille % 10 == 0) s"p${mille / 10}" else s"p${mille / 10}_${mille % 10}"
  }

  /** Fail fast (with the colliding ps named) rather than emit duplicate
    * column names. */
  def requireDistinctLabels(ps: Seq[Double]): Unit = {
    val dup = ps.groupBy(pLabel).filter(_._2.size > 1)
    require(dup.isEmpty,
      s"percentile labels collide at per-mille precision: " +
        dup.map { case (l, vs) => s"$l<=${vs.mkString(",")}" }.mkString("; "))
  }

  /** Per-group exact nearest-rank quantiles of `valueCol`: for each
    * requested p, the smallest value whose cumulative count reaches
    * `ceil(p·n)` — an actual data value, no interpolation (the
    * [[graft.queries.Exact]] discipline; the q103 dwell-percentile
    * pattern, generalized).
    *
    * Shape at scale: one partial-aggregated groupBy compresses the raw
    * rows into a per-(group, value) HISTOGRAM before any ordering, so the
    * per-group cumulative window sorts distinct values with
    * multiplicities, not rows — the compress-then-rank move. Groups are
    * window partitions: per-group state is the distinct-value count, and
    * the final pick is one more tiny aggregate. */
  def exactGroupQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.95)): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1), s"ps=$ps")
    requireDistinctLabels(ps)
    val hist = df.groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("c"))
    val byGroup = Window.partitionBy(col(groupCol))
    val cum = byGroup.orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = hist
      .withColumn("cum", sum(col("c")).over(cum))
      .withColumn("n", sum(col("c")).over(byGroup))
    val picks = ps.map { p =>
      min(when(col("cum") >= ceil(lit(p) * col("n")), col(valueCol)))
        .as(pLabel(p))
    }
    ranked.groupBy(col(groupCol))
      .agg(max(col("n")).as("n"), picks: _*)
  }

  /** GLOBAL quantile bucketing: each row gets the 1-based bucket of its
    * value under exact nearest-rank cuts at p = i/nBuckets — the
    * distributed histogram-equalization shape ("decile by quality, then
    * weight/sample per decile"). Bucket = 1 + #{cuts < value}: values
    * equal to a cut close the LOWER bucket, matching the nearest-rank
    * cut definition (smallest value with cum ≥ ceil(p·n)), so bucket
    * populations are as even as ties allow and the mapping is total.
    *
    * Shape at scale: the cut computation is [[exactGroupQuantiles]] on a
    * constant group — it compresses to the value DOMAIN before its
    * window, so "global" costs a domain-sized sort, not a corpus sort —
    * and the cut row broadcasts back as a 1-row cross join; assignment is
    * a row-local comparison fan-out. No window, no shuffle of the
    * assigned relation. */
  def bucketByGlobalQuantiles(df: DataFrame, valueCol: String,
      nBuckets: Int): DataFrame = {
    require(nBuckets >= 2, s"nBuckets=$nBuckets")
    val ps = (1 until nBuckets).map(_.toDouble / nBuckets)
    val cutCols = ps.map(pLabel)
    val cuts = exactGroupQuantiles(
      df.select(col(valueCol), lit(1).as("_g")), "_g", valueCol, ps)
      .drop("_g", "n")
    df.crossJoin(broadcast(cuts))
      .withColumn("bucket",
        cutCols.map(c => (col(valueCol) > col(c)).cast("int"))
          .reduce(_ + _) + lit(1))
      .drop(cutCols: _*)
  }
}
