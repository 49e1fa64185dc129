package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.LayoutCols

/** Multi-dimensional data layout: Z-order clustering for the at-rest
  * corpus, so range predicates on EITHER of two dimensions prune files.
  *
  * A linear sort clusters exactly one column; predicates on a second
  * column read every file. Z-ordering sorts by the Morton interleave of
  * both dimensions' scaled values: every file then covers a small range
  * of BOTH columns, and min/max footer pruning (or partition pruning)
  * works for each — the standard lakehouse layout trick for
  * (key, date)- or (lat, lng)-addressed corpora.
  *
  * Scale shape: one O(1)-row min/max probe (driver holds two constants
  * per dimension — same contract as the centroid collects), then a
  * single range-shuffle on the Z-value; the interleave itself is a native
  * codegen expression on the scan. No skew pitfall: Z-values inherit the
  * near-uniformity of the scaled dimensions, and `repartitionByRange`
  * samples the actual distribution either way.
  */
object Layout {

  /** The Z-value column for two numeric dimensions, min/max-scaled to
    * `bits` bits each from the PROVIDED bounds (callers that know domain
    * bounds skip the probe; [[zorderBy]] probes them). Scaling arithmetic
    * is plain double math (floor((v−min)·(2^bits−1)/(max−min))) so any
    * engine reproduces the exact codes. Degenerate dimensions
    * (min == max) scale to 0 — the interleave then orders by the other
    * dimension alone. */
  def zValue(x: Column, y: Column, xMin: Double, xMax: Double,
      yMin: Double, yMax: Double, bits: Int = 16): Column = {
    def scaled(c: Column, lo: Double, hi: Double): Column =
      if (hi == lo) lit(0L)
      else floor((c.cast("double") - lit(lo)) * lit(((1L << bits) - 1).toDouble)
        / lit(hi - lo)).cast("long")
    LayoutCols.bitInterleave(scaled(x, xMin, xMax), scaled(y, yMin, yMax), bits)
  }

  /** The Z-value for N numeric dimensions (`bounds(i)` = (min, max) of
    * `cols(i)`): each dimension min/max-scales to `bits` bits and the
    * N-ary Morton interleave ([[LayoutCols.bitInterleaveN]]) orders the
    * n-cube. `bits` defaults to the largest per-axis width that fits a
    * long (⌊63/n⌋, capped at 16 — beyond 16 bits per axis the extra
    * resolution is below file-granularity anyway). For n = 2 the codes
    * are bit-identical to [[zValue]]. */
  def zValueN(cols: Seq[Column], bounds: Seq[(Double, Double)],
      bits: Int = 0): Column = {
    require(cols.size >= 2 && cols.size == bounds.size,
      "zValueN needs >= 2 columns with one (min, max) pair each")
    val b = if (bits > 0) bits else math.min(16, 63 / cols.size)
    def scaled(c: Column, lo: Double, hi: Double): Column =
      if (hi == lo) lit(0L)
      else floor((c.cast("double") - lit(lo)) *
        lit(((1L << b) - 1).toDouble) / lit(hi - lo)).cast("long")
    LayoutCols.bitInterleaveN(
      cols.zip(bounds).map { case (c, (lo, hi)) => scaled(c, lo, hi) }, b)
  }

  /** Z-order-cluster `df` on two numeric columns: probe their bounds,
    * range-partition by Z-value, sort within partitions — the DataFrame
    * is then laid out for a `Sinks.parquet` write whose files are
    * prunable on both dimensions. */
  def zorderBy(df: DataFrame, xCol: String, yCol: String,
      bits: Int = 16, numFiles: Option[Int] = None): DataFrame = {
    val b = df.agg(
      min(col(xCol)).cast("double"), max(col(xCol)).cast("double"),
      min(col(yCol)).cast("double"), max(col(yCol)).cast("double")).head()
    val z = zValue(col(xCol), col(yCol),
      b.getDouble(0), b.getDouble(1), b.getDouble(2), b.getDouble(3), bits)
    val withZ = df.withColumn("__z", z)
    val ranged = numFiles.fold(withZ.repartitionByRange(col("__z")))(
      n => withZ.repartitionByRange(n, col("__z")))
    ranged.sortWithinPartitions("__z").drop("__z")
  }

  /** Size-targeted compaction: repartition so a subsequent write emits
    * files of roughly `targetBytes` each — the small-files remedy (a
    * 100 TB table accreted from streaming micro-batches or per-job
    * appends degrades every later scan: footer-fetch and task-schedule
    * overhead scale with FILE COUNT, not data size).
    *
    * The partition count comes from the OPTIMIZER's size estimate
    * (`optimizedPlan.stats.sizeInBytes` — file-based relations report
    * actual on-disk bytes), so sizing costs zero extra jobs; the
    * round-robin repartition then yields near-equal file sizes, unlike
    * `coalesce` which both skips the rebalance AND collapses upstream
    * parallelism. In-memory bytes overstate parquet-encoded bytes, so
    * files land somewhat under target — the safe side of the trade
    * (pass a larger target to correct). Pair with [[zorderBy]] when the
    * compacted layout should also prune: compact fixes file COUNT,
    * Z-order fixes file CONTENT. */
  def compact(df: DataFrame, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes=$targetBytes")
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val parts = (bytes + targetBytes - 1) / targetBytes
    df.repartition(parts.min(BigInt(1 << 20)).max(BigInt(1)).toInt)
  }
}
