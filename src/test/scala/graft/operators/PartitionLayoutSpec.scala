package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Generalized table layouts ([[TimeTravel]]): unpartitioned tables,
  * multi-column + TYPED partitioning, composite merge/upsert/delete
  * keys — and the pruning/conflict contracts that must survive the
  * generalization (typed directory order, per-dir pruning at any
  * depth, DV identity, partition-column APIs). */
class PartitionLayoutSpec extends SparkSpec {

  import spark.implicits._

  private def df(rows: (Long, String, Double)*) =
    rows.toDF("id", "part", "v")

  test("unpartitioned table: init/append/upsert/deleteWhere/compact round-trip with files at the data root") {
    val t = tmpDir("layout-unpart")
    TimeTravel.init(spark, t, df((1L, "a", 1.0), (2L, "b", 2.0)), "")
    TimeTravel.append(spark, t, df((3L, "c", 3.0)), "")
    TimeTravel.upsert(spark, t, df((2L, "b", 20.0)), "id", "")
    TimeTravel.deleteWhere(spark, t, col("id") === 3L, "")
    val tip = TimeTravel.latestVersion(spark, t)
    assert(TimeTravel.filesAt(spark, t, tip).forall(!_.contains('/')),
      "no partition directories may appear")
    assert(TimeTravel.partitionColumns(spark, t).isEmpty)
    assert(TimeTravel.partitionColumn(spark, t) === "")
    val got = TimeTravel.readVersion(spark, t, tip)
      .select("id", "v").as[(Long, Double)].collect().toMap
    assert(got === Map(1L -> 1.0, 2L -> 20.0))
    // time travel still answers every version
    assert(TimeTravel.readVersion(spark, t, 1).count() === 2)
    assert(TimeTravel.readVersion(spark, t, 2).count() === 3)
    // compaction folds the root files
    val pre = TimeTravel.filesAt(spark, t, tip).size
    val v = TimeTravel.compact(spark, t, "")
    assert(TimeTravel.filesAt(spark, t, v).size < pre)
    assert(TimeTravel.readVersion(spark, t, v)
      .select("id", "v").as[(Long, Double)].collect().toMap === got)
    // declarative read over the unpartitioned layout
    val decl = spark.read.format("graft-versioned").option("path", t).load()
    assert(decl.count() === 2)
    assert(decl.columns.toSet === Set("id", "part", "v"))
  }

  test("two-column TYPED partitioning: nested dirs, typed values round-trip, per-dir pruning at both depths") {
    val t = tmpDir("layout-2col")
    val rows = (1 to 120).map { i =>
      (i.toLong, java.sql.Date.valueOf(f"2024-${i % 4 + 1}%02d-01"),
        s"r${i % 3}", i * 1.0)
    }.toDF("id", "d", "r", "v")
    TimeTravel.init(spark, t, rows.filter(col("id") <= 60), "d,r")
    TimeTravel.append(spark, t, rows.filter(col("id") > 60), "d,r")
    assert(TimeTravel.partitionColumns(spark, t) === Seq("d", "r"))
    val files = TimeTravel.filesAt(spark, t, 2)
    assert(files.forall(_.split('/').length == 3),
      s"expected d=…/r=…/name layout, got ${files.take(3)}")
    // typed round-trip: the read returns DATE values, not dir text
    val tip = TimeTravel.readVersion(spark, t, 2)
    assert(tip.schema("d").dataType ===
      org.apache.spark.sql.types.DateType)
    assert(tip.count() === 120)
    assert(tip.filter(col("d") === java.sql.Date.valueOf("2024-02-01"))
      .count() === 30)
    // conjunctive per-dir prune on BOTH axes, before any data access
    val scan = TimeTravel.readVersionSkippingAll(spark, t, 2, Seq(
      TimeTravel.ColRange("d", java.sql.Date.valueOf("2024-02-01"),
        java.sql.Date.valueOf("2024-02-01")),
      TimeTravel.ColRange("r", "r1", "r1")))
    assert(scan.filesRead > 0 && scan.filesRead * 6 <= scan.filesTotal,
      s"two-axis dir prune: ${scan.filesRead}/${scan.filesTotal}")
    assert(scan.df.filter(col("d") === java.sql.Date.valueOf("2024-02-01")
      && col("r") === "r1").count() ===
      (1 to 120).count(i => i % 4 + 1 == 2 && i % 3 == 1))
    // declarative relation: typed partition schema + partition pruning
    val decl = spark.read.format("graft-versioned").option("path", t).load()
    assert(decl.schema("d").dataType ===
      org.apache.spark.sql.types.DateType)
    assert(decl.filter(col("d") === java.sql.Date.valueOf("2024-03-01")
      && col("r") === "r2").count() ===
      (1 to 120).count(i => i % 4 + 1 == 3 && i % 3 == 2))
  }

  test("INT partition values prune under NUMERIC order, not byte order") {
    val t = tmpDir("layout-int")
    val rows = (1 to 40).map(i => (i.toLong, i % 12, i * 1.0))
      .toDF("id", "b", "v") // bucket 9 vs 10: byte order would flip
    TimeTravel.init(spark, t, rows, "b")
    val scan = TimeTravel.readVersionSkipping(spark, t, 1, "b", 9, 10)
    assert(scan.df.select("b").distinct().as[Int].collect().sorted.toSeq
      === Seq(9, 10),
      "dir text '9' and '10' must both survive a [9,10] range: " +
        "numeric order, not UTF-8 order")
    assert(scan.filesRead < scan.filesTotal, "other buckets pruned")
  }

  test("composite keys: upsert, delete and MERGE address (k1,k2) business keys") {
    val t = tmpDir("layout-ckey")
    val rows = Seq((1L, 10L, "a", 1.0), (1L, 20L, "a", 2.0),
      (2L, 10L, "b", 3.0)).toDF("k1", "k2", "part", "v")
    TimeTravel.init(spark, t, rows, "part")
    // upsert: replace exactly (1,20); (1,10) untouched despite shared k1
    TimeTravel.upsert(spark, t,
      Seq((1L, 20L, "a", 22.0)).toDF("k1", "k2", "part", "v"),
      "k1,k2", "part")
    val afterUp = TimeTravel.readVersion(spark, t, 2)
      .select("k1", "k2", "v").as[(Long, Long, Double)].collect().toSet
    assert(afterUp === Set((1L, 10L, 1.0), (1L, 20L, 22.0),
      (2L, 10L, 3.0)))
    // composite-key MERGE: matched update + not-matched insert
    val src = Seq((1L, 10L, "a", 100.0), (9L, 90L, "c", 9.0))
      .toDF("k1", "k2", "part", "v")
    TimeTravel.merge(spark, t, src, "k1,k2", "part", Seq(
      TimeTravel.MatchedUpdate(None, Map("v" -> col("src.v"))),
      TimeTravel.NotMatchedInsert()))
    val afterMerge = TimeTravel.readVersion(spark, t,
        TimeTravel.latestVersion(spark, t))
      .select("k1", "k2", "v").as[(Long, Long, Double)].collect().toSet
    assert(afterMerge === Set((1L, 10L, 100.0), (1L, 20L, 22.0),
      (2L, 10L, 3.0), (9L, 90L, 9.0)))
    // duplicate composite SOURCE keys refuse (two (1,10) rows)
    val dup = Seq((1L, 10L, "a", 1.0), (1L, 10L, "a", 2.0))
      .toDF("k1", "k2", "part", "v")
    val e = intercept[IllegalArgumentException](
      TimeTravel.merge(spark, t, dup, "k1,k2", "part",
        Seq(TimeTravel.MatchedUpdate())))
    assert(e.getMessage.contains("duplicate keys"))
    // same k1 with two distinct k2 is NOT a duplicate
    TimeTravel.merge(spark, t,
      Seq((1L, 10L, "a", 101.0), (1L, 20L, "a", 23.0))
        .toDF("k1", "k2", "part", "v"),
      "k1,k2", "part", Seq(TimeTravel.MatchedUpdate()))
    // composite-key delete
    TimeTravel.delete(spark, t, Seq((1L, 10L)).toDF("k1", "k2"),
      "k1,k2", "part")
    val finalRows = TimeTravel.readVersion(spark, t,
        TimeTravel.latestVersion(spark, t))
      .select("k1", "k2", "v").as[(Long, Long, Double)].collect().toSet
    assert(finalRows === Set((1L, 20L, 23.0), (2L, 10L, 3.0),
      (9L, 90L, 9.0)))
  }

  test("DV deletes and predicate updates work on multi-column layouts") {
    val t = tmpDir("layout-dv2")
    val rows = (1 to 60).map(i =>
      (i.toLong, i % 3, s"g${i % 2}", i * 1.0)).toDF("id", "b", "g", "v")
    TimeTravel.init(spark, t, rows, "b,g")
    val v = TimeTravel.deleteWhereDv(spark, t, col("id") % 10 === 0, "b,g")
    assert(TimeTravel.readVersion(spark, t, v).count() === 54)
    assert(TimeTravel.readVersion(spark, t, v)
      .filter(col("id") % 10 === 0).count() === 0)
    // declarative MOR read over the multi-col DV-bound version
    val decl = spark.read.format("graft-versioned").option("path", t).load()
    assert(decl.count() === 54)
    TimeTravel.updateWhere(spark, t, col("id") === 7L,
      Map("v" -> lit(700.0)), "b,g")
    assert(TimeTravel.readVersion(spark, t,
        TimeTravel.latestVersion(spark, t))
      .filter(col("id") === 7L).select("v").as[Double].head() === 700.0)
  }

  test("refusals: non-canonical partition types, NULL components, and SET on any partition column") {
    val t = tmpDir("layout-refuse")
    val bad = Seq((1L, 1.5, "x")).toDF("id", "p", "s")
    val e = intercept[IllegalArgumentException](
      TimeTravel.init(spark, t, bad, "p"))
    assert(e.getMessage.contains("canonical"))
    val rows = Seq((1L, "a", java.sql.Date.valueOf("2024-01-01"), 1.0))
      .toDF("id", "r", "d", "v")
    TimeTravel.init(spark, tmpDir("layout-refuse2"), rows, "r,d")
    val t2 = tmpDir("layout-refuse3")
    val withNull = Seq((1L, null.asInstanceOf[String],
      java.sql.Date.valueOf("2024-01-01"), 1.0)).toDF("id", "r", "d", "v")
    intercept[IllegalArgumentException](
      TimeTravel.init(spark, t2, withNull, "r,d"))
    val t3 = tmpDir("layout-refuse4")
    TimeTravel.init(spark, t3, rows, "r,d")
    val e3 = intercept[IllegalArgumentException](
      TimeTravel.updateWhere(spark, t3, col("id") === 1L,
        Map("d" -> lit(java.sql.Date.valueOf("2024-02-01"))), "r,d"))
    assert(e3.getMessage.contains("partition column"))
  }

  test("repartitionTable: partition EVOLUTION as one rewrite — new layout governs, old versions keep theirs, feeds skip it, appends must declare the new list") {
    val t = tmpDir("layout-repart")
    TimeTravel.init(spark, t,
      df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0)), "part")
    TimeTravel.append(spark, t, df((4L, "b", 4.0)), "part") // v2
    // a DV delete rides along to prove it materializes through
    TimeTravel.deleteWhereDv(spark, t, col("id") === 3L, "part") // v3
    val vOld = TimeTravel.latestVersion(spark, t)
    // SQL verb, empty () relocates to the unpartitioned root
    val v = graft.sql.GraftSql.exec(spark,
      s"REPARTITION TABLE graft.`$t` BY ()")
    assert(TimeTravel.partitionColumns(spark, t).isEmpty)
    assert(TimeTravel.filesAt(spark, t, v).forall(!_.contains('/')))
    // rows identical (the DV'd row stays gone), old version intact
    assert(TimeTravel.readVersion(spark, t, v)
      .select("id", "v").as[(Long, Double)].collect().toMap ===
      Map(1L -> 1.0, 2L -> 2.0, 4L -> 4.0))
    assert(TimeTravel.filesAt(spark, t, vOld)
      .forall(_.startsWith("part=")))
    assert(TimeTravel.readVersion(spark, t, vOld).count() === 3)
    // feeds treat it as dataChange=false: a window crossing ONLY the
    // repartition delivers nothing (rows identical, just relocated)
    assert(TimeTravel.readAppendsSince(spark, t, vOld).count() === 0)
    // appends now declare the NEW layout; the old one refuses loudly
    intercept[IllegalArgumentException](
      TimeTravel.append(spark, t, df((5L, "c", 5.0)), "part"))
    TimeTravel.append(spark, t, df((5L, "c", 5.0)), "")
    assert(TimeTravel.readVersion(spark, t,
      TimeTravel.latestVersion(spark, t)).count() === 4)
    // …and BACK to a partitioned layout, by the API this time
    val v2 = TimeTravel.repartitionTable(spark, t, "part")
    assert(TimeTravel.partitionColumns(spark, t) === Seq("part"))
    assert(TimeTravel.filesAt(spark, t, v2)
      .forall(_.startsWith("part=")))
    assert(TimeTravel.readVersion(spark, t, v2)
      .select("id").as[Long].collect().sorted === Seq(1L, 2L, 4L, 5L))
    // partition-axis skipping prunes by the NEW directories
    assert(TimeTravel.filesAt(spark, t, v2).count(_.startsWith("part=b"))
      < TimeTravel.filesAt(spark, t, v2).size)
    // refusals: no-op layout, unknown column
    intercept[IllegalArgumentException](
      TimeTravel.repartitionTable(spark, t, "part"))
    intercept[IllegalArgumentException](
      TimeTravel.repartitionTable(spark, t, "nope"))
  }

  test("streaming source tails an unpartitioned table") {
    import graft.streaming.{EventsStream, VersionedStream}
    val t = tmpDir("layout-unpart-stream")
    TimeTravel.init(spark, t, df((1L, "a", 1.0)), "")
    TimeTravel.append(spark, t, df((2L, "b", 2.0)), "")
    TimeTravel.append(spark, t, df((3L, "c", 3.0)), "")
    val out = tmpDir("layout-unpart-out")
    val ck = tmpDir("layout-unpart-ck")
    EventsStream.replayToParquet(
      VersionedStream.readStream(spark, t, sinceVersion = Some(1)),
      out, ck)
    assert(spark.read.parquet(out).select("id").as[Long]
      .collect().sorted.toSeq === Seq(2L, 3L))
  }
}
