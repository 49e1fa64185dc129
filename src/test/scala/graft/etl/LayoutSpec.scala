package graft.etl

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** At-scale storage layouts: partition pruning and shuffle-free bucketed
  * joins, asserted from the physical plans. */
class LayoutSpec extends SparkSpec {

  test("partitioned parquet: scans prune partitions on the partition key") {
    val dir = tmpDir("graft-part") + "/events_by_type"
    Sinks.partitionedParquet(Tables.load(spark, sf, "events"), dir,
      Seq("event_type"))
    val scan = spark.read.parquet(dir).filter(col("event_type") === "signup")
    val physical = scan.queryExecution.executedPlan.toString
    assert(physical.contains("PartitionFilters") &&
      physical.contains("event_type"))
    // pruned read returns exactly the one partition's rows
    val expected = Tables.load(spark, sf, "events")
      .filter(col("event_type") === "signup").count()
    assert(scan.count() === expected)
  }

  test("bucketed tables: equi-join on the bucket column plans no shuffle") {
    // clear table metadata AND any stale managed-table directories from
    // previous JVM runs (the in-memory catalog forgets, the disk doesn't)
    for (t <- Seq("orders_b", "lineitem_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, t)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(loc)
    }
    val orders = Tables.load(spark, sf, "orders")
    Sinks.bucketedTable(orders.select("o_orderkey", "o_totalprice"),
      "orders_b", "o_orderkey", 4)
    Sinks.bucketedTable(
      Tables.load(spark, sf, "lineitem").select("l_orderkey", "l_quantity"),
      "lineitem_b", "l_orderkey", 4)
    // force a non-broadcast join so the shuffle-elision is what's tested
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("lineitem_b").join(spark.table("orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() === Tables.load(spark, sf, "lineitem").count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("z-order layout clusters BOTH dimensions; linear sort only one") {
    import spark.implicits._
    // deterministic pseudo-uniform 2-D points (hash-derived, no RNG)
    val pts = spark.range(0, 20000).select(
      (abs(hash(col("id"))) % 10000L).as("x"),
      (abs(hash(col("id") * 7 + 3)) % 10000L).as("y"))
    def widthRatios(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val w = df.withColumn("part", spark_partition_id())
        .groupBy("part")
        .agg((max($"x") - min($"x")).as("wx"), (max($"y") - min($"y")).as("wy"))
        .agg(avg($"wx"), avg($"wy")).head()
      (w.getDouble(0) / 10000.0, w.getDouble(1) / 10000.0)
    }
    val (zx, zy) = widthRatios(
      graft.operators.Layout.zorderBy(pts, "x", "y", bits = 16,
        numFiles = Some(16)))
    // 16 range partitions of the Z-curve ≈ a 4×4 grid: each partition
    // spans ~1/4 of EACH dimension (plus curve-boundary slop)
    assert(zx < 0.6 && zy < 0.6, s"z-order widths: x=$zx y=$zy")
    val (lx, ly) = widthRatios(pts.repartitionByRange(16, $"x"))
    assert(lx < 0.2, s"linear sort should cluster x tightly, got $lx")
    assert(ly > 0.8, s"linear sort leaves y unclustered, got $ly")
    // the z-ordered relation is a pure reordering: same point multiset
    val a = graft.operators.Layout.zorderBy(pts, "x", "y")
      .groupBy("x", "y").count().collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = pts.groupBy("x", "y").count().collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a === b)
  }

  test("compact: file count tracks the byte target; data is a pure " +
      "repartition") {
    import spark.implicits._
    val ev = graft.Tables.load(spark, sf, "events")
    val bytes = ev.queryExecution.optimizedPlan.stats.sizeInBytes.toLong
    assert(bytes > 0)
    def filesWritten(df: org.apache.spark.sql.DataFrame): Int = {
      val d = tmpDir("graft-compact")
      df.write.mode("overwrite").parquet(d)
      new java.io.File(d).listFiles().count(_.getName.endsWith(".parquet"))
    }
    // target ≥ relation size → exactly one file
    assert(filesWritten(graft.operators.Layout.compact(ev, bytes * 2)) === 1)
    // target ~1/8 of the relation → ~8 near-equal files
    val n = filesWritten(graft.operators.Layout.compact(ev, bytes / 8))
    assert(n >= 6 && n <= 10, s"files=$n")
    // pure repartition: same row multiset
    assert(graft.operators.Layout.compact(ev, bytes / 4)
      .groupBy($"event_id").count().filter($"count" =!= 1).isEmpty)
    assert(graft.operators.Layout.compact(ev, bytes / 4).count() === ev.count())
    intercept[IllegalArgumentException](graft.operators.Layout.compact(ev, 0))
  }
}
