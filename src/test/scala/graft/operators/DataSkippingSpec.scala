package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Data-skipping invariants on the versioned table: per-file min/max
  * stats ride in the commit log, reads prune files from the log ALONE,
  * pruning is conservative (files without a usable bound are read, a
  * skipped read is always a superset of the matching rows), and stats
  * survive checkpoints, rewrites, and vacuum. */
class DataSkippingSpec extends SparkSpec {

  import spark.implicits._

  /** Three disjoint-key-range appends over two partitions — the
    * clustered-ingest shape skipping exists for. */
  private def stagedRanges(): String = {
    val dir = tmpDir("tt-skip")
    def batch(lo: Long, hi: Long) =
      (lo to hi).map(i => (i, if (i % 2 == 0) "pA" else "pB", s"name$i"))
        .toDF("id", "part", "name")
    TimeTravel.init(spark, dir, batch(1, 100), "part")
    TimeTravel.append(spark, dir, batch(101, 200), "part")
    TimeTravel.append(spark, dir, batch(201, 300), "part")
    dir
  }

  test("key-range read prunes to the overlapping batch's files; content is exact") {
    val dir = stagedRanges()
    val v = TimeTravel.latestVersion(spark, dir)
    val scan = TimeTravel.readVersionSkipping(spark, dir, v, "id",
      120L, 180L)
    // every file got stats, and only the middle batch's files survive
    assert(scan.filesWithStats === scan.filesTotal)
    assert(scan.filesRead < scan.filesTotal)
    val full = TimeTravel.readVersion(spark, dir, v)
      .filter(col("id").between(120, 180))
    val pruned = scan.df.filter(col("id").between(120, 180))
    assert(pruned.collect().map(_.getAs[Long]("id")).sorted.toSeq ===
      full.collect().map(_.getAs[Long]("id")).sorted.toSeq)
    // superset contract: the unfiltered scan holds at least the matches
    assert(scan.df.count() >= full.count())
  }

  test("a range hitting no batch reads zero files and returns a typed empty frame") {
    val dir = stagedRanges()
    val v = TimeTravel.latestVersion(spark, dir)
    val scan = TimeTravel.readVersionSkipping(spark, dir, v, "id",
      5000L, 6000L)
    assert(scan.filesRead === 0)
    assert(scan.df.columns.toSeq === Seq("id", "part", "name"))
    assert(scan.df.count() === 0)
  }

  test("string-column bounds prune lexicographically") {
    val dir = tmpDir("tt-skip-str")
    def b(names: Seq[String]) =
      names.zipWithIndex.map { case (n, i) => (i.toLong, "p1", n) }
        .toDF("id", "part", "name")
    TimeTravel.init(spark, dir, b(Seq("apple", "avocado", "banana")), "part")
    TimeTravel.append(spark, dir, b(Seq("mango", "melon")), "part")
    TimeTravel.append(spark, dir, b(Seq("zebra", "zucchini")), "part")
    val v = TimeTravel.latestVersion(spark, dir)
    val scan = TimeTravel.readVersionSkipping(spark, dir, v, "name",
      "m", "n")
    assert(scan.filesRead < scan.filesTotal)
    assert(scan.df.filter(col("name").between("m", "n"))
      .collect().map(_.getAs[String]("name")).sorted.toSeq ===
      Seq("mango", "melon"))
  }

  test("a column with no usable stats is never skipped on (conservative)") {
    val dir = tmpDir("tt-skip-null")
    // `maybe` is NULL in the first batch — its files carry no bound for
    // it, so a read on `maybe` must still include them
    TimeTravel.init(spark, dir,
      Seq((1L, "p1", null.asInstanceOf[java.lang.Long]),
        (2L, "p1", null.asInstanceOf[java.lang.Long]))
        .toDF("id", "part", "maybe"), "part")
    TimeTravel.append(spark, dir,
      Seq((3L, "p1", java.lang.Long.valueOf(30L))).toDF("id", "part", "maybe"),
      "part")
    val v = TimeTravel.latestVersion(spark, dir)
    val scan = TimeTravel.readVersionSkipping(spark, dir, v, "maybe",
      0L, 100L)
    // the all-null file has no bound for `maybe`: it is read, not skipped
    assert(scan.filesRead === scan.filesTotal)
    assert(scan.df.filter(col("maybe").between(0, 100)).count() === 1)
  }

  test("rewrites refresh stats: after an upsert the new file's bounds reflect the merged rows") {
    val dir = stagedRanges()
    // move key 150 far out of its batch's range within partition pA
    TimeTravel.upsert(spark, dir,
      Seq((150L, "pA", "moved")).toDF("id", "part", "name"), "id", "part")
    val v = TimeTravel.latestVersion(spark, dir)
    val scan = TimeTravel.readVersionSkipping(spark, dir, v, "id",
      150L, 150L)
    assert(scan.filesWithStats === scan.filesTotal)
    val hit = scan.df.filter(col("id") === 150)
    assert(hit.count() === 1)
    assert(hit.head().getAs[String]("name") === "moved")
    // the old version still prunes with ITS stats
    val old = TimeTravel.readVersionSkipping(spark, dir, v - 1, "id",
      250L, 260L)
    assert(old.filesRead < old.filesTotal)
  }

  test("stats survive a cadence checkpoint and a vacuum floor") {
    val dir = tmpDir("tt-skip-vac")
    def batch(lo: Long, hi: Long) =
      (lo to hi).map(i => (i, "p1", s"n$i")).toDF("id", "part", "name")
    TimeTravel.init(spark, dir, batch(1, 10), "part")
    (1 to 10).foreach(k => TimeTravel.append(spark, dir,
      batch(k * 10 + 1, k * 10 + 10), "part"))
    // v11 > checkpointEvery: resolution of latest goes through the v10
    // cadence checkpoint, which must carry stats for retained files
    val v = TimeTravel.latestVersion(spark, dir)
    assert(v === 11)
    val pre = TimeTravel.readVersionSkipping(spark, dir, v, "id", 55L, 58L)
    assert(pre.filesWithStats === pre.filesTotal)
    assert(pre.filesRead < pre.filesTotal)
    // vacuum to floor 6: the floor checkpoint must carry stats too
    TimeTravel.vacuum(spark, dir, 6)
    val post = TimeTravel.readVersionSkipping(spark, dir, v, "id", 55L, 58L)
    assert(post.filesWithStats === post.filesTotal)
    assert(post.filesRead === pre.filesRead)
    assert(post.df.filter(col("id").between(55, 58)).count() === 4)
    val floor = TimeTravel.readVersionSkipping(spark, dir, 6, "id",
      15L, 18L)
    assert(floor.filesWithStats === floor.filesTotal)
    assert(floor.filesRead < floor.filesTotal)
    assert(floor.df.filter(col("id").between(15, 18)).count() === 4)
  }

  test("decimal and date bounds prune numerically") {
    val dir = tmpDir("tt-skip-dec")
    val sqlc = spark
    import sqlc.implicits._
    def b(lo: Int, hi: Int) = (lo to hi)
      .map(i => (i.toLong, "p1", BigDecimal(i) * BigDecimal("1.50"),
        java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1)
          .plusDays(i.toLong))))
      .toDF("id", "part", "amount", "day")
    TimeTravel.init(spark, dir, b(1, 50), "part")
    TimeTravel.append(spark, dir, b(51, 100), "part")
    val v = TimeTravel.latestVersion(spark, dir)
    val byAmount = TimeTravel.readVersionSkipping(spark, dir, v, "amount",
      BigDecimal("90.0"), BigDecimal("120.0"))
    assert(byAmount.filesRead < byAmount.filesTotal)
    assert(byAmount.df
      .filter(col("amount").between(lit("90.0"), lit("120.0")))
      .count() === 21) // ids 60..80
    val byDay = TimeTravel.readVersionSkipping(spark, dir, v, "day",
      java.sql.Date.valueOf("2024-03-01"), java.sql.Date.valueOf("2024-03-10"))
    assert(byDay.filesRead < byDay.filesTotal)
    assert(byDay.df.filter(col("day")
        .between(lit("2024-03-01"), lit("2024-03-10"))).count() === 10)
  }
}
