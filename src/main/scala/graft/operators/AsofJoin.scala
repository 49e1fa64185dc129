package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: attach to each left row the nearest right row with the
  * same key — the most recent one at-or-before the left time (backward,
  * the default), or the earliest one at-or-after it (forward) — optionally
  * only within a `tolerance` interval of the left time.
  *
  * Spark has no native as-of operator (SURVEY.md §2.9 lists it among the
  * missing join kinds). The classic scalable plan — used here — is the
  * union trick: tag both sides, union them, and run one
  * `last_value(ignoreNulls)` window per key ordered by (time, side).
  * Cost: a single shuffle+sort on (key, time) — no range-condition
  * explosion, no per-row binary search, and it scales exactly like any
  * windowed aggregation (state is one row per partition cursor). The
  * forward direction is the same scan run time-descending; tolerance is a
  * row-local post-check on the matched row's time (the window already
  * found the nearest candidate, so outside-tolerance simply nulls the
  * attachment — no second pass).
  *
  * Ties (right.time == left.time) match in BOTH directions, mirroring
  * ASOF JOIN's inclusive comparisons: right rows sort inside the
  * window scan so an equal-timestamp right row is visible to the left row.
  */
object AsofJoin {

  /** @param left       left relation
    * @param right      right relation (the "lookup" side)
    * @param key        equi-join key column name (same name both sides)
    * @param leftTime   left timestamp column name
    * @param rightTime  right timestamp column name
    * @param attach     right columns to carry onto left rows, renamed as given
    * @param direction  "backward" (right.time <= left.time, nearest below —
    *                   the default) or "forward" (right.time >= left.time,
    *                   nearest above)
    * @param tolerance  optional interval string (e.g. "7 days"): matches
    *                   farther than this from the left time are nulled
    */
  def asof(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      attach: Map[String, String],
      direction: String = "backward",
      tolerance: Option[String] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction=$direction")
    val attachCols = attach.toSeq
    // all attach columns travel as ONE struct so the window picks a whole
    // right row atomically — per-column last() would mix values from
    // different right rows whenever an attach column is null (row
    // tearing). The matched row's own time rides along as `__rt` (LAST
    // field: ties compare equal on it, so the attach-first tie-break
    // order is unchanged) for the tolerance check.
    val rStruct = struct(attachCols.map { case (src, as) =>
      col(src).as(as) } :+ col(rightTime).as("__rt"): _*)
    val lTagged = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .withColumn("_r", lit(null).cast(
        right.select(rStruct).schema.head.dataType))
    val rTagged = right
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .select(col(key), col("_t"), col("_side"), rStruct.as("_r"))
    // align schemas: left columns not present on right become nulls
    val leftCols = lTagged.columns
    val rAligned = rTagged.select(leftCols.map { c =>
      if (rTagged.columns.contains(c)) col(c) else lit(null).as(c)
    }: _*)

    // Backward: ascending (time, side, attach) — rights precede lefts at
    // equal time, `last` picks the nearest right at-or-before, greatest
    // attach tuple on exact-time ties (deterministic — physical row order
    // never decides). Forward: the same scan time-DESCENDING; rights
    // still precede lefts at equal time (side asc), and attach ASC makes
    // the latest-listed tie row — the one `last` picks — the greatest
    // attach tuple, preserving the tie contract across directions.
    val w = (if (direction == "backward")
        Window.partitionBy(col(key))
          .orderBy(col("_t").asc, col("_side").asc, col("_r").asc)
      else
        Window.partitionBy(col(key))
          .orderBy(col("_t").desc, col("_side").asc, col("_r").asc))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = col("_r_last")
    val withinTol: Column = tolerance match {
      case None => matched.isNotNull
      case Some(tol) =>
        val diff =
          if (direction == "backward") col("_t") - matched.getField("__rt")
          else matched.getField("__rt") - col("_t")
        matched.isNotNull && diff <= expr(s"INTERVAL $tol")
    }
    lTagged.unionByName(rAligned)
      .withColumn("_r_last", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(Seq(col("*")) ++ attachCols.map { case (_, as) =>
        when(withinTol, matched.getField(as)).as(as)
      }: _*)
      .drop("_t", "_side", "_r", "_r_last")
  }
}
