package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Accuracy contract of the sketch aggregates vs exact computation.
  *
  * q42 itself now emits tolerance-band verdict booleans (the driver
  * hash-checks them against literal `true`); this spec asserts those
  * verdicts hold AND re-checks the raw sketches at a tighter 5% relative
  * error than q42's generous 10% band, so sketch drift is caught here
  * before it ever widens to the driver contract.
  */
class ApproxSpec extends SparkSpec {

  test("q42 tolerance-band verdicts all hold") {
    val rows = ParityQueries.q42.run(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows; band <- Seq("parts_in_band", "orders_in_band", "p50_in_band", "p99_in_band"))
      assert(r.getAs[Boolean](band), s"band $band failed for group ${r.getString(0)}")
  }

  test("HLL cardinalities within 5% of exact; approx quantiles bracket exact ranks") {
    val approx = Tables.load(spark, sf, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), rsd = 0.02).as("approx_parts"),
        approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("approx_orders"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("p50_price"),
        percentile_approx(col("l_extendedprice"), lit(0.99), lit(1000)).as("p99_price"))
      .collect().map(r => r.getString(0) -> r).toMap
    val exact = Tables.load(spark, sf, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("parts"),
        countDistinct(col("l_orderkey")).as("orders"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(approx.keySet === exact.keySet)
    for ((flag, a) <- approx) {
      val e = exact(flag)
      def relErr(x: Long, y: Long) = math.abs(x - y).toDouble / math.max(y, 1)
      assert(relErr(a.getAs[Long]("approx_parts"), e.getAs[Long]("parts")) < 0.05)
      assert(relErr(a.getAs[Long]("approx_orders"), e.getAs[Long]("orders")) < 0.05)
      assert(a.getAs[Double]("p50_price") < a.getAs[Double]("p99_price"))
    }
  }
}
