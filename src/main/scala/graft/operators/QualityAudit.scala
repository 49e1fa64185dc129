package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint auditing (the Deequ shape): a
  * check suite runs as ONE aggregation pass over the table and emits one
  * row per constraint with its observed count and pass verdict — the
  * validation gate a pipeline runs before promoting an export, as a
  * first-class relational result instead of side-channel assertions.
  *
  * Shape at scale: every check compiles to an aggregate expression over
  * the same scan, so the suite costs one corpus pass + one 1-row shuffle
  * regardless of how many checks it carries (uniqueness checks add the
  * usual count-distinct Expand, factor ≤ number of distinct-key checks).
  * The single aggregate row then explodes row-locally into the
  * per-constraint report. All metrics are BIGINT counts — exact,
  * cross-engine, no ratios in the contract. */
object QualityAudit {

  sealed trait Check {
    def name: String
    /** Count of rows SATISFYING the check (aggregate expression). */
    def observed: Column
    /** Count the check needs to reach to pass. */
    def expected: Column
  }
  /** Column is never NULL. */
  final case class Complete(column: String) extends Check {
    val name = s"complete_$column"
    def observed: Column = count(col(column))
    def expected: Column = count(lit(1))
  }
  /** Column (combination) is unique across rows. */
  final case class Unique(columns: Seq[String]) extends Check {
    val name = s"unique_${columns.mkString("_")}"
    def observed: Column =
      countDistinct(col(columns.head), columns.tail.map(col): _*)
    def expected: Column = count(lit(1))
  }
  /** Every non-NULL value inside [lo, hi]. */
  final case class Bounds(column: String, lo: Double, hi: Double) extends Check {
    val name = s"bounds_$column"
    def observed: Column = sum(
      when(col(column).isNull, 0L)
        .when(col(column) >= lo && col(column) <= hi, 1L)
        .otherwise(0L))
    def expected: Column = count(col(column))
  }
  /** Every non-NULL value drawn from the allowed set. */
  final case class InSet(column: String, values: Seq[String]) extends Check {
    val name = s"inset_$column"
    def observed: Column = sum(
      when(col(column).isNull, 0L)
        .when(col(column).isin(values.map(v => v: Any): _*), 1L)
        .otherwise(0L))
    def expected: Column = count(col(column))
  }

  /** Run the suite: one row per check — (check, n_observed, n_expected,
    * pass). */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "empty check suite")
    require(checks.map(_.name).distinct.size == checks.size,
      s"duplicate check names: ${checks.map(_.name)}")
    // coalesce: sum() over an empty table is NULL, and a NULL observed
    // would make `pass` three-valued — an empty table must PASS a
    // 0-expected check, boolean-cleanly
    val aggs = checks.flatMap(c => Seq(
      coalesce(c.observed.cast("long"), lit(0L)).as(s"obs_${c.name}"),
      coalesce(c.expected.cast("long"), lit(0L)).as(s"exp_${c.name}")))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val report = checks.map(c =>
      struct(lit(c.name).as("check"),
        col(s"obs_${c.name}").as("n_observed"),
        col(s"exp_${c.name}").as("n_expected")))
    one.select(explode(array(report: _*)).as("r"))
      .select(col("r.check"), col("r.n_observed"), col("r.n_expected"),
        (col("r.n_observed") === col("r.n_expected")).as("pass"))
  }
}
