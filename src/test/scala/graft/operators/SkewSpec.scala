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

  test("q120's merge hint pins a shuffle join (the plan AQE skew handling " +
      "applies to) and matches q115's salted result") {
    val aqe = graft.queries.Relational.q120.run(spark, sf)
    // the hint must have kept the small side off the broadcast path:
    // AQE can only split an exchange that exists
    val plan = aqe.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"expected a shuffle join, got:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"), "small side was broadcast")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_items"), r.getAs[Double]("total_price"))).toMap
    assert(rows(aqe) === rows(graft.queries.Relational.q115.run(spark, sf)))
  }

  test("AQE actually splits a skewed partition at runtime (forced thresholds)") {
    // A deliberately hot key (90% of rows) under artificially tiny skew
    // thresholds: the executed SMJ must carry the skew=true marker, i.e.
    // the runtime re-plan the q120 scaladoc's 100 TB story relies on is
    // real under this session's settings, not an assumed default.
    val keep = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16k")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1k")
      val big = spark.range(0, 200000)
        .select(when($"id" % 10 < 9, lit(7L)).otherwise($"id").as("k"),
          concat(lit("payload-payload-payload-"), $"id").as("v"))
      val dim = spark.range(0, 1000).select($"id".as("k"), ($"id" * 2).as("w"))
      val joined = big.hint("merge").join(dim, Seq("k"))
      // collect THIS dataframe (count() would spawn a separate pruned
      // QueryExecution): AQE's final plan exists only after execution
      assert(joined.collect().length === 180000 + 100)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE skew split did not fire; plan:\n$plan")
    } finally keep.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }
}
