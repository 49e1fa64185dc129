package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Skew-mitigation operators: salting splits a hot key across `saltFactor`
  * reducers so one executor never owns a whole hot key.
  *
  * Salts are deterministic (hash-derived, not random) so plans stay
  * replayable and results engine-comparable. AQE's runtime skew-join
  * handling covers sort-merge joins; explicit salting is the tool for
  * skewed AGGREGATIONS and for broadcast-averse hot-key joins.
  */
object Skew {

  /** Deterministic salt in [0, saltFactor) derived from a distributing
    * column (not the group key — the whole point is to split the key). */
  def salt(distributor: Column, saltFactor: Int): Column =
    pmod(hash(distributor), lit(saltFactor)).cast(IntegerType)

  /** Two-phase (salted) exact aggregation: phase 1 aggregates on
    * (key, salt) — spreading each hot key over saltFactor partitions —
    * phase 2 combines the partials. Decimal-exact sums make the rewrite
    * result-identical to the direct groupBy. */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
      distributor: Column, saltFactor: Int): DataFrame = {
    val partial = df
      .groupBy(key.as("k"), salt(distributor, saltFactor).as("s"))
      .agg(sum(value.cast(DecimalType(28, 10))).as("psum"),
        count(lit(1)).as("pcount"))
    partial.groupBy(col("k"))
      .agg(sum(col("psum")).cast(DoubleType).as("total"),
        sum(col("pcount")).as("n"))
  }

  /** Salted join of a big relation against a hot-keyed right side that is
    * too large to broadcast whole but small enough to replicate
    * `saltFactor`×: big side gets a deterministic salt, right side is
    * exploded across all salt values, and the join key becomes
    * (key, salt) — splitting each hot key's probe work. */
  def saltedJoin(big: DataFrame, right: DataFrame, key: String,
      distributor: Column, saltFactor: Int): DataFrame = {
    val salted = big.withColumn("_salt", salt(distributor, saltFactor))
    val replicated = right
      .withColumn("_salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
