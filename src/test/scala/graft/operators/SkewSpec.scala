package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Salting rewrites must be result-identical to their direct forms. */
class SkewSpec extends SparkSpec {

  import spark.implicits._

  test("salted two-phase aggregation equals the direct groupBy exactly") {
    val ev = Tables.load(spark, sf, "events")
    val salted = Skew.saltedSumCount(ev, $"event_type", $"value",
      $"event_id", saltFactor = 16)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val direct = ev.groupBy($"event_type")
      .agg(sum($"value".cast("decimal(28,10)")).cast("double").as("total"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(salted === direct)
  }

  test("salted join equals the plain join (same pairs, saltFactor-split probes)") {
    val li = Tables.load(spark, sf, "lineitem").select($"l_orderkey", $"l_quantity")
    val ord = Tables.load(spark, sf, "orders")
      .select($"o_orderkey".as("l_orderkey"), $"o_totalprice")
    val saltedCount = Skew.saltedJoin(li, ord, "l_orderkey",
      distributor = $"l_quantity", saltFactor = 4).count()
    val plainCount = li.join(ord, Seq("l_orderkey")).count()
    assert(saltedCount === plainCount)
  }
}
