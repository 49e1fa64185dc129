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
    val lTagged = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .select(Seq(col("*")) ++ attachCols.map { case (_, as) =>
        lit(null).as(s"_r_$as")
      }: _*)
    val rTagged = right
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .select(Seq(col(key), col("_t"), col("_side")) ++ attachCols.map {
        case (src, as) => col(src).as(s"_r_$as")
      }: _*)
    // align schemas: left columns not present on right become nulls
    val leftCols = lTagged.columns
    val rAligned = rTagged.select(leftCols.map { c =>
      if (rTagged.columns.contains(c)) col(c) else lit(null).as(c)
    }: _*)

    val w = Window.partitionBy(col(key))
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lTagged.unionByName(rAligned)
      .select(Seq(col("*")) ++ attachCols.map { case (_, as) =>
        last(col(s"_r_$as"), ignoreNulls = true).over(w).as(as)
      }: _*)
      .filter(col("_side") === 1)
      .drop((Seq("_t", "_side") ++ attachCols.map { case (_, as) => s"_r_$as" }): _*)
  }
}
