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

  test("double bounds compare in EXACT binary expansion: a file whose min equals the query's hi is read") {
    // 0.1's exact double expansion is 0.1000000000000000055…, STRICTLY
    // ABOVE the shortest-decimal text "0.1". If the query bound were
    // converted via toString, the recorded min (exact) would compare
    // greater than the hi bound ("0.1") and the file holding 0.1 would
    // be wrongly skipped — silently dropping a row that matches
    // `v <= 0.1` under Spark's own comparison.
    val dir = tmpDir("tt-skip-dbl")
    import spark.implicits._
    TimeTravel.init(spark, dir,
      Seq((1L, "p1", 0.1), (2L, "p1", 0.2)).toDF("id", "part", "v"), "part")
    TimeTravel.append(spark, dir,
      Seq((3L, "p1", 0.5), (4L, "p1", 0.9)).toDF("id", "part", "v"), "part")
    val v = TimeTravel.latestVersion(spark, dir)
    val scan = TimeTravel.readVersionSkipping(spark, dir, v, "v", 0.0, 0.1)
    assert(scan.filesWithStats === scan.filesTotal)
    assert(scan.df.filter(col("v") <= 0.1).count() === 1)
    // and the second batch's file IS still skipped (bounds stay useful)
    assert(scan.filesRead < scan.filesTotal)
    // float keys widen exactly too (matching Spark's float→double
    // comparison widening): probing with the FLOAT 0.1f must keep the
    // file whose doubles bracket 0.1f's widened value 0.100000001490…
    val scanF = TimeTravel.readVersionSkipping(spark, dir, v, "v",
      java.lang.Float.valueOf(0.0f), java.lang.Float.valueOf(0.1f))
    assert(scanF.filesRead >= 1 && scanF.filesRead < scanF.filesTotal)
  }

  test("delete by double key probes with exact bounds: the matching row actually dies") {
    // the discovery envelope rides the same num() conversion — a
    // toString'd 0.1 envelope would miss the file whose recorded min is
    // the exact expansion, and the delete would silently no-op while
    // reporting success (the right-to-be-forgotten failure mode).
    val dir = tmpDir("tt-del-dbl")
    import spark.implicits._
    TimeTravel.init(spark, dir,
      Seq((0.1, "p1", "a"), (0.2, "p1", "b")).toDF("k", "part", "x"), "part")
    TimeTravel.append(spark, dir,
      Seq((0.7, "p1", "c")).toDF("k", "part", "x"), "part")
    val v = TimeTravel.delete(spark, dir,
      Seq(0.1).toDF("k"), "k", "part")
    assert(v === 3) // a real commit, not a silent no-op
    val left = TimeTravel.readVersion(spark, dir, v)
      .select("x").as[String].collect().sorted
    assert(left.toSeq === Seq("b", "c"))
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

  test("clustered compaction folds small files AND keeps skipping selective") {
    val dir = tmpDir("tt-skip-clust")
    def batch(lo: Long, hi: Long) =
      (lo to hi).map(i => (i, if (i % 2 == 0) "pA" else "pB", s"n$i"))
        .toDF("id", "part", "name")
    TimeTravel.init(spark, dir, batch(1, 100), "part")
    (1 to 5).foreach(k =>
      TimeTravel.append(spark, dir, batch(k * 100 + 1, k * 100 + 100),
        "part"))
    val v0 = TimeTravel.latestVersion(spark, dir) // 6 files per dir
    val vc = TimeTravel.compact(spark, dir, "part",
      clusterBy = Some(("id", 3)))
    assert(vc === v0 + 1)
    // per-dir file count is bounded by the bucket count — folded from 6
    val byDir = TimeTravel.filesAt(spark, dir, vc)
      .groupBy(f => f.substring(0, f.indexOf('/'))).view.mapValues(_.size)
    assert(byDir.values.forall(_ <= 3))
    assert(byDir.values.sum < 12) // genuinely consolidated
    // a narrow range still prunes: files cover disjoint id ranges
    val scan = TimeTravel.readVersionSkipping(spark, dir, vc, "id",
      30L, 80L)
    assert(scan.filesWithStats === scan.filesTotal)
    assert(scan.filesRead < scan.filesTotal)
    assert(scan.df.filter(col("id").between(30, 80)).count() === 51)
    // content identity and history: the pre-compaction version intact
    assert(TimeTravel.readVersion(spark, dir, vc).count() === 600)
    assert(TimeTravel.readVersion(spark, dir, v0).count() === 600)
    // a dir already at/below the bucket count is NOT rewritten
    assert(TimeTravel.compact(spark, dir, "part",
      clusterBy = Some(("id", 3))) === vc)
  }

  test("zorder compaction folds files AND keeps BOTH axes' skipping selective") {
    val dir = tmpDir("tt-zorder")
    val spk = spark
    import spk.implicits._
    // 8 ingest slabs clustered on id only: an x2-window read touches
    // every file before maintenance
    (0 until 8).foreach { s =>
      val df = ((s * 100) until (s * 100 + 100)).map { i =>
        (i.toLong, (i * 37 % 800).toLong, "all", i * 1.0)
      }.toDF("id", "x2", "part", "v").repartition(1)
      if (s == 0) TimeTravel.init(spark, dir, df, "part")
      else TimeTravel.append(spark, dir, df, "part")
    }
    val v0 = TimeTravel.latestVersion(spark, dir)
    val before = TimeTravel.readVersionSkipping(spark, dir, v0,
      "x2", 100L, 199L)
    assert(before.filesRead === before.filesTotal,
      "pre-maintenance x2 window reads everything (id-clustered slabs)")
    val vc = TimeTravel.compact(spark, dir, "part",
      zorderBy = Some((Seq("id", "x2"), 4)))
    assert(vc === v0 + 1)
    assert(TimeTravel.filesAt(spark, dir, vc).size <= 4)
    // both axes now prune
    val idScan = TimeTravel.readVersionSkipping(spark, dir, vc,
      "id", 0L, 99L)
    val x2Scan = TimeTravel.readVersionSkipping(spark, dir, vc,
      "x2", 0L, 99L)
    assert(idScan.filesRead < idScan.filesTotal, "id axis prunes")
    assert(x2Scan.filesRead < x2Scan.filesTotal, "x2 axis prunes")
    // content identity on both windows and the prior version
    assert(idScan.df.filter(col("id") <= 99).count() === 100)
    assert(x2Scan.df.filter(col("x2") <= 99).count() ===
      (0 until 800).count(i => i * 37 % 800 <= 99))
    assert(TimeTravel.readVersion(spark, dir, v0).count() === 800)
    // clusterBy and zorderBy together are refused
    intercept[IllegalArgumentException](TimeTravel.compact(spark, dir,
      "part", clusterBy = Some(("id", 2)),
      zorderBy = Some((Seq("id", "x2"), 2))))
  }

  test("NULL bounds: both-null keeps all; one null side is UNBOUNDED but the defined side still prunes") {
    val dir = stagedRanges()
    val v = TimeTravel.latestVersion(spark, dir)
    // both sides null: no decision, full read, never an NPE
    val all = TimeTravel.readVersionSkipping(spark, dir, v, "id",
      null, null)
    assert(all.filesRead === all.filesTotal)
    assert(all.df.count() === 300)
    // one-sided (the batch relation's pushed `col <= hi` shape): the
    // defined side prunes, content stays a superset of the range
    val hiOnly = TimeTravel.readVersionSkipping(spark, dir, v, "id",
      null, 100L)
    assert(hiOnly.filesRead < hiOnly.filesTotal)
    assert(hiOnly.df.filter(col("id") <= 100).count() ===
      all.df.filter(col("id") <= 100).count())
    val loOnly = TimeTravel.readVersionSkipping(spark, dir, v, "id",
      201L, null)
    assert(loOnly.filesRead < loOnly.filesTotal)
    assert(loOnly.df.filter(col("id") >= 201).count() ===
      all.df.filter(col("id") >= 201).count())
  }

  test("schema check ignores NESTED nullability differences") {
    val dir = tmpDir("tt-nested-null")
    val spk = spark
    import org.apache.spark.sql.types._
    val strict = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("part", StringType),
      StructField("s", StructType(Seq(
        StructField("x", IntegerType, nullable = false))))))
    def rowsWith(schema: StructType) = spk.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, "p1", org.apache.spark.sql.Row(5))),
      schema)
    TimeTravel.init(spark, dir, rowsWith(strict), "part")
    // the same shape with the NESTED field relaxed to nullable — Spark
    // flips these routinely; the commit must not be refused
    val relaxed = StructType(Seq(
      StructField("id", LongType),
      StructField("part", StringType),
      StructField("s", StructType(Seq(
        StructField("x", IntegerType, nullable = true))))))
    val v = TimeTravel.append(spark, dir,
      rowsWith(relaxed).withColumn("id", col("id") + 1), "part")
    assert(TimeTravel.readVersion(spark, dir, v).count() === 2)
  }

  test("a bound that cannot convert degrades to a full read, never a throw") {
    val dir = tmpDir("tt-skip-ts")
    val rows = Seq(
      (1L, "p1", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (2L, "p1", java.sql.Timestamp.valueOf("2024-06-01 00:00:00")))
      .toDF("id", "part", "ts")
    TimeTravel.init(spark, dir, rows, "part")
    TimeTravel.append(spark, dir,
      Seq((3L, "p1", java.sql.Timestamp.valueOf("2024-12-01 00:00:00")))
        .toDF("id", "part", "ts"), "part")
    val v = TimeTravel.latestVersion(spark, dir)
    // timestamps are never stats-eligible AND the bound doesn't parse
    // as a number: the scan must fall back to every file, not throw
    val scan = TimeTravel.readVersionSkipping(spark, dir, v, "ts",
      java.sql.Timestamp.valueOf("2024-05-01 00:00:00"),
      java.sql.Timestamp.valueOf("2024-07-01 00:00:00"))
    assert(scan.filesRead === scan.filesTotal)
    assert(scan.df.filter(col("ts")
      .between("2024-05-01", "2024-07-01")).count() === 1)
  }

  test("string bounds compare in UTF-8 byte order, not UTF-16 (non-BMP safe)") {
    val dir = tmpDir("tt-skip-utf8")
    // one file holds U+E000 and a non-BMP emoji (U+1F600): in UTF-16
    // the emoji's lead surrogate 0xD83D sorts BELOW 0xE000, but its
    // UTF-8 bytes (F0 9F 98 80) sort ABOVE U+E000's (EE 80 80) — so
    // the file's parquet max (UTF-8 order) is the emoji. A UTF-16
    // compare would see max(emoji) < lo(U+E000) and wrongly skip the
    // file that contains the queried value.
    val pua = "\uE000"
    val emoji = new String(Character.toChars(0x1F600))
    TimeTravel.init(spark, dir,
      Seq((1L, "p1", pua), (2L, "p1", emoji))
        .toDF("id", "part", "s"), "part")
    TimeTravel.append(spark, dir,
      Seq((3L, "p1", "aaa")).toDF("id", "part", "s"), "part")
    val v = TimeTravel.latestVersion(spark, dir)
    val scan = TimeTravel.readVersionSkipping(spark, dir, v, "s",
      pua, pua)
    val hits = scan.df.filter(col("s") === pua)
    assert(hits.count() === 1) // the row survives the pruned scan
    // and the all-ASCII file IS skippable under the same ordering
    assert(scan.filesRead < scan.filesTotal)
  }

  test("driver and distributed stats paths produce identical payloads") {
    val dir = stagedRanges()
    val fs = TimeTravel.hadoopFs(spark, dir)
    val files = TimeTravel.filesAt(spark, dir,
      TimeTravel.latestVersion(spark, dir))
    val onDriver = TimeTravel.computeAddStats(spark, fs, dir, files,
      threshold = Int.MaxValue)
    val distributed = TimeTravel.computeAddStats(spark, fs, dir, files,
      threshold = 0)
    assert(onDriver.nonEmpty)
    assert(distributed === onDriver)
  }

  test("driver and distributed vacuum filesystem paths agree (listing and deletes)") {
    val dir = stagedRanges()
    val fs = TimeTravel.hadoopFs(spark, dir)
    val onDriver = TimeTravel.listDataFiles(spark, fs, dir,
      threshold = Int.MaxValue)
    val distributed = TimeTravel.listDataFiles(spark, fs, dir,
      threshold = 0)
    assert(onDriver.nonEmpty)
    assert(distributed === onDriver)
    // distributed deletes confirm exactly the files that existed
    val victims = onDriver.toSeq.sorted.take(2)
    val n = TimeTravel.deleteDataFiles(spark, fs, dir, victims,
      threshold = 0)
    assert(n === 2)
    assert(TimeTravel.listDataFiles(spark, fs, dir) ===
      onDriver -- victims)
    // a re-delete of already-gone files confirms zero
    assert(TimeTravel.deleteDataFiles(spark, fs, dir, victims,
      threshold = 0) === 0)
  }

  test("conjunctive skipping prunes strictly harder than either column alone") {
    val dir = tmpDir("tt-skip-conj")
    // a 3x3 grid of (id-range, amount-range) batches: a conjunction of
    // one id slab AND one amount band must isolate ~one batch's files,
    // while either predicate alone keeps a full row or column of the grid
    def batch(idLo: Long, amtLo: Long) =
      (0L to 9L).map(i => (idLo + i, "p1", (amtLo + i).toDouble))
        .toDF("id", "part", "amount")
    TimeTravel.init(spark, dir, batch(0, 0), "part")
    (Seq((0L, 100L), (0L, 200L), (100L, 0L), (100L, 100L), (100L, 200L),
      (200L, 0L), (200L, 100L), (200L, 200L)))
      .foreach { case (i, a) => TimeTravel.append(spark, dir, batch(i, a),
        "part") }
    val v = TimeTravel.latestVersion(spark, dir)
    val byId = TimeTravel.readVersionSkipping(spark, dir, v, "id",
      100L, 109L)
    val byAmt = TimeTravel.readVersionSkipping(spark, dir, v, "amount",
      100.0, 109.0)
    val both = TimeTravel.readVersionSkippingAll(spark, dir, v, Seq(
      TimeTravel.ColRange("id", 100L, 109L),
      TimeTravel.ColRange("amount", 100.0, 109.0)))
    assert(byId.filesRead === 3)  // one grid row
    assert(byAmt.filesRead === 3) // one grid column
    assert(both.filesRead === 1)  // the intersection cell
    assert(both.df.filter(col("id").between(100, 109) &&
      col("amount").between(100, 109)).count() === 10)
  }

  test("MERGE discovery probes only the files whose key bounds intersect the batch envelope") {
    val dir = stagedRanges() // 3 disjoint key slabs (1-100, 101-200, 201-300)
    // a delete inside the third slab: discovery probes that slab's two
    // files (one per partition dir) of the six, and deletes exactly
    TimeTravel.delete(spark, dir, Seq(250L, 260L).toDF("id"),
      "id", "part")
    val (probed, total) = TimeTravel.discoveryStats(dir)
    assert(total === 6 && probed === 2,
      s"expected 2 of 6 probed, got $probed of $total")
    assert(TimeTravel.readVersion(spark, dir,
      TimeTravel.latestVersion(spark, dir)).count() === 298)
    // an upsert whose keys live in the middle slab: the envelope skips
    // the untouched slabs' files, and the merge stays exact — including
    // the cross-partition move (150 is even → pA, moves to pB)
    TimeTravel.upsert(spark, dir,
      Seq((150L, "pB", "moved"), (160L, "pA", "upd"))
        .toDF("id", "part", "name"), "id", "part")
    val (probed2, total2) = TimeTravel.discoveryStats(dir)
    assert(probed2 < total2 && probed2 > 0,
      s"expected a pruned probe, got $probed2 of $total2")
    val after = TimeTravel.readVersion(spark, dir,
      TimeTravel.latestVersion(spark, dir))
    assert(after.count() === 298) // 2 updates, 0 inserts
    assert(after.filter(col("id") === 150L).select("part", "name")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("pB", "moved")))
    // a pure INSERT batch beyond every recorded bound probes NOTHING
    TimeTravel.upsert(spark, dir,
      Seq((999L, "pA", "new")).toDF("id", "part", "name"), "id", "part")
    val (probed3, _) = TimeTravel.discoveryStats(dir)
    assert(probed3 === 0)
    assert(TimeTravel.readVersion(spark, dir,
      TimeTravel.latestVersion(spark, dir)).count() === 299)
  }

  test("delete keys coerce to the TABLE's key type before the envelope is computed") {
    val dir = stagedRanges() // LONG id column
    // string keys (a CSV-sourced delete list): STRING min/max order is
    // ("100","9") — an inverted numeric interval that would skip the
    // file holding id=9 if the envelope were computed under the keys'
    // own type. The coercion makes both the envelope and the join
    // numeric, so both rows delete.
    TimeTravel.delete(spark, dir, Seq("9", "100").toDF("id"),
      "id", "part")
    val after = TimeTravel.readVersion(spark, dir,
      TimeTravel.latestVersion(spark, dir))
    assert(after.count() === 298)
    assert(after.filter(col("id").isin(9L, 100L)).count() === 0)
    // an un-castable key becomes NULL and matches nothing
    TimeTravel.delete(spark, dir, Seq("not-a-number").toDF("id"),
      "id", "part")
    assert(TimeTravel.readVersion(spark, dir,
      TimeTravel.latestVersion(spark, dir)).count() === 298)
  }

  test("a conjunct on the PARTITION column prunes by directory text") {
    val dir = tmpDir("tt-skip-part")
    def b(month: String, idLo: Long) =
      (idLo to idLo + 9).map(i => (i, month, s"n$i"))
        .toDF("id", "month", "name")
    TimeTravel.init(spark, dir, b("2024-01", 0), "month")
    Seq("2024-02", "2024-03", "2024-04").zipWithIndex.foreach {
      case (m, i) => TimeTravel.append(spark, dir, b(m, (i + 1) * 100L),
        "month") }
    val v = TimeTravel.latestVersion(spark, dir)
    // partition values never appear in footer stats, yet the conjunct
    // prunes: the value rides in every file's directory name
    val scan = TimeTravel.readVersionSkippingAll(spark, dir, v, Seq(
      TimeTravel.ColRange("month", "2024-02", "2024-03")))
    assert(scan.filesRead === 2)
    assert(scan.df.select("month").distinct().collect()
      .map(_.getString(0)).sorted.toSeq === Seq("2024-02", "2024-03"))
    // and it composes with a stats conjunct on a data column
    val both = TimeTravel.readVersionSkippingAll(spark, dir, v, Seq(
      TimeTravel.ColRange("month", "2024-02", "2024-03"),
      TimeTravel.ColRange("id", 100L, 109L)))
    assert(both.filesRead === 1)
    assert(both.df.filter(col("id").between(100, 109)).count() === 10)
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
