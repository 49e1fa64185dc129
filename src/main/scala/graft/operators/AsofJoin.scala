package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: attach to each left row the most recent right row with the
  * same key and right.time <= left.time.
  *
  * Spark has no native as-of operator (SURVEY.md §2.9 lists it among the
  * missing join kinds). The classic scalable plan — used here — is the
  * union trick: tag both sides, union them, and run one
  * `last_value(ignoreNulls)` window per key ordered by (time, side).
  * Cost: a single shuffle+sort on (key, time) — no range-condition
  * explosion, no per-row binary search, and it scales exactly like any
  * windowed aggregation (state is one row per partition cursor).
  *
  * Ties (right.time == left.time) match, mirroring ASOF JOIN's `>=`
  * semantics: right rows sort before left rows at equal timestamps.
  */
object AsofJoin {

  /** @param left       left relation
    * @param right      right relation (the "lookup" side)
    * @param key        equi-join key column name (same name both sides)
    * @param leftTime   left timestamp column name
    * @param rightTime  right timestamp column name
    * @param attach     right columns to carry onto left rows, renamed as given
    */
  def asof(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      attach: Map[String, String]): DataFrame = {
    val attachCols = attach.toSeq
    // all attach columns travel as ONE struct so the window picks a whole
    // right row atomically — per-column last() would mix values from
    // different right rows whenever an attach column is null (row tearing)
    val rStruct = struct(attachCols.map { case (src, as) => col(src).as(as) }: _*)
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

    // `_r` as the final sort key: right rows sharing (key, _t) would
    // otherwise be picked in physical-row order (nondeterministic across
    // runs/partitionings); ordering by the attach struct makes the
    // greatest attach tuple the deterministic winner. `_r` is null on left
    // rows, whose relative order is irrelevant (their _r is ignored).
    val w = Window.partitionBy(col(key))
      .orderBy(col("_t"), col("_side"), col("_r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lTagged.unionByName(rAligned)
      .withColumn("_r_last", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(Seq(col("*")) ++ attachCols.map { case (_, as) =>
        col(s"_r_last.$as").as(as)
      }: _*)
      .drop("_t", "_side", "_r", "_r_last")
  }
}
