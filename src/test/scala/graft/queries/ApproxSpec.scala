package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Accuracy contract of the sketch aggregates vs exact computation. */
class ApproxSpec extends SparkSpec {

  test("HLL cardinalities within 5% of exact; approx quantiles bracket exact ranks") {
    val approx = ParityQueries.q42.run(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
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
