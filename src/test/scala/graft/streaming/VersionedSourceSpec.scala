package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TimeTravel

/** The versioned-table streaming source: commit-log offsets, admission
  * control, snapshot/tail/CDC modes, checkpointed restart-resume with no
  * re-delivery and no gap, and loud refusal of vacuumed-away windows. */
class VersionedSourceSpec extends SparkSpec {

  import spark.implicits._

  private def df(rows: (Long, String, Double)*) =
    rows.toDF("id", "part", "v")

  private def outIds(out: String): Seq[Long] =
    spark.read.parquet(out).select("id").as[Long].collect().sorted.toSeq

  private def nBatches(ck: String): Int =
    Option(new java.io.File(ck, "offsets").list())
      .map(_.count(_.forall(_.isDigit))).getOrElse(0)

  test("tail mode: append windows deliver per-commit batches; compact " +
      "commits are skipped; maxVersionsPerTrigger holds under AvailableNow") {
    val t = tmpDir("vsrc-tail")
    TimeTravel.init(spark, t, df((1L, "a", 1.0), (2L, "b", 2.0)), "part")
    TimeTravel.append(spark, t, df((3L, "a", 3.0)), "part") // v2
    TimeTravel.append(spark, t, df((4L, "b", 4.0)), "part") // v3
    TimeTravel.compact(spark, t, "part") // v4: dataChange=false
    val out = tmpDir("vsrc-tail-out")
    val ck = tmpDir("vsrc-tail-ck")
    EventsStream.replayToParquet(
      VersionedStream.readStream(spark, t, sinceVersion = Some(1),
        maxVersionsPerTrigger = Some(1)), out, ck)
    // only the appended rows; init snapshot and compaction never delivered
    assert(outIds(out) === Seq(3L, 4L))
    // one commit per micro-batch: v2, v3, v4 → three batches, proving the
    // admission-control path survives the AvailableNow trigger (a plain
    // V1 source would be wrapped and collapse to one batch)
    assert(nBatches(ck) >= 3)
  }

  test("sinceTimestamp delivers commits at or after the wall-clock; " +
      "pre-history tails from the first commit; restarts survive vacuum") {
    val t = tmpDir("vsrc-sints")
    TimeTravel.init(spark, t, df((1L, "a", 1.0)), "part")
    TimeTravel.append(spark, t, df((2L, "a", 2.0)), "part") // v2
    val tsV2 = TimeTravel.history(spark, t)
      .find(_.version == 2).flatMap(_.timestampMs).get
    TimeTravel.append(spark, t, df((3L, "a", 3.0)), "part") // v3
    val out = tmpDir("vsrc-sints-out")
    val ck = tmpDir("vsrc-sints-ck")
    // INCLUSIVE: v2 committed exactly at tsV2 delivers too. One commit
    // per batch, so the checkpoint holds per-version offsets — the
    // restart below re-initializes from its LAST WINDOW's offsets and
    // never re-asks the timestamp.
    EventsStream.replayToParquet(
      VersionedStream.readStream(spark, t,
        sinceTimestamp = Some(tsV2.toString),
        maxVersionsPerTrigger = Some(1)), out, ck)
    assert(outIds(out) === Seq(2L, 3L))
    // a PRE-HISTORY timestamp tails from the first commit (every
    // append; the init snapshot is the default mode's job)
    val out0 = tmpDir("vsrc-sints-out0")
    EventsStream.replayToParquet(
      VersionedStream.readStream(spark, t, sinceTimestamp = Some("1")),
      out0, tmpDir("vsrc-sints-ck0"))
    assert(outIds(out0) === Seq(2L, 3L))
    // lazy resolution: vacuum the pre-timestamp history away (v1's
    // record and stamp drop; an eager lookup would now resolve the
    // fallback cursor 1 and die on the vacuumed window), append more,
    // and RESTART from the checkpoint — the stream resumes from its
    // offset; the timestamp is never consulted again
    TimeTravel.vacuum(spark, t, keepFrom = 2)
    TimeTravel.append(spark, t, df((4L, "a", 4.0)), "part") // v4
    EventsStream.replayToParquet(
      VersionedStream.readStream(spark, t,
        sinceTimestamp = Some(tsV2.toString),
        maxVersionsPerTrigger = Some(1)), out, ck)
    assert(outIds(out) === Seq(2L, 3L, 4L))
    // mutually exclusive with sinceVersion — loud refusal
    val e = intercept[Exception] {
      EventsStream.replayToParquet(
        VersionedStream.readStream(spark, t, sinceVersion = Some(1),
          sinceTimestamp = Some(tsV2.toString)),
        tmpDir("vsrc-sints-out2"), tmpDir("vsrc-sints-ck2"))
    }
    assert(e.getMessage.contains("mutually exclusive") ||
      Option(e.getCause).exists(_.getMessage.contains("mutually exclusive")))
  }

  test("file-count admission: maxFilesPerTrigger packs whole add files, " +
      "splits fat commits, composes with the other caps, exactly-once") {
    val t = tmpDir("vsrc-files")
    TimeTravel.init(spark, t, df((0L, "a", 0.0)), "part")
    // a fat commit landing 6 files (6 partition dirs)…
    TimeTravel.append(spark, t,
      (1L to 30L).map(i => (i, s"p${i % 6}", i.toDouble))
        .toDF("id", "part", "v"), "part") // v2
    TimeTravel.append(spark, t, df((31L, "b", 31.0)), "part") // v3
    val out = tmpDir("vsrc-files-out")
    val ck = tmpDir("vsrc-files-ck")
    EventsStream.replayToParquet(
      VersionedStream.readStream(spark, t, sinceVersion = Some(1),
        maxFilesPerTrigger = Some(2)), out, ck)
    // exactly-once, and 6 files at 2 per trigger need >= 3 batches + v3
    assert(outIds(out) === (1L to 31L))
    assert(nBatches(ck) >= 4)
  }

  test("row-based admission: a fat commit splits across triggers at file " +
      "boundaries, exactly-once, with whole-version offsets between") {
    val t = tmpDir("vsrc-rows")
    TimeTravel.init(spark, t, df((0L, "a", 0.0)), "part")
    // a FAT backfill commit: 80 rows across 8 partition dirs → 8 add
    // files of 10 rows each (the staged write lands one file per dir)
    TimeTravel.append(spark, t,
      (1L to 80L).map(i => (i, s"p${i % 8}", i.toDouble))
        .toDF("id", "part", "v"), "part") // v2
    TimeTravel.append(spark, t, df((81L, "b", 81.0)), "part") // v3
    val out = tmpDir("vsrc-rows-out")
    val ck = tmpDir("vsrc-rows-ck")
    EventsStream.replayToParquet(
      VersionedStream.readStream(spark, t, sinceVersion = Some(1),
        maxRowsPerTrigger = Some(25L)), out, ck)
    // exactly-once across the splits: every appended row, none twice
    assert(outIds(out) === (1L to 81L))
    // the fat commit could not have landed as one batch: 80 rows at a
    // 25-row budget need >= 4 triggers, plus v3
    assert(nBatches(ck) >= 4)
  }

  test("row-based admission resumes mid-commit from a checkpoint with no " +
      "re-delivery and no gap") {
    val t = tmpDir("vsrc-rows-resume")
    TimeTravel.init(spark, t, df((0L, "a", 0.0)), "part")
    TimeTravel.append(spark, t,
      (1L to 60L).map(i => (i, s"p${i % 6}", i.toDouble))
        .toDF("id", "part", "v"), "part") // v2: 6 dirs → 6 files x 10 rows
    val out = tmpDir("vsrc-rr-out")
    val ck = tmpDir("vsrc-rr-ck")
    // run 1 drains v2 in 20-row slices (mid-commit offsets checkpointed)
    EventsStream.replayToParquet(
      VersionedStream.readStream(spark, t, sinceVersion = Some(1),
        maxRowsPerTrigger = Some(20L)), out, ck)
    assert(outIds(out) === (1L to 60L))
    val batches1 = nBatches(ck)
    assert(batches1 >= 3, s"60 rows at 20-row budget: got $batches1")
    // more commits while down; the restart picks up where it left off
    TimeTravel.append(spark, t, df((61L, "a", 61.0)), "part")
    EventsStream.replayToParquet(
      VersionedStream.readStream(spark, t, sinceVersion = Some(1),
        maxRowsPerTrigger = Some(20L)), out, ck)
    assert(outIds(out) === (1L to 61L))
  }

  test("mid-commit offsets round-trip through their checkpoint json (SerializedOffset restart)") {
    val t = tmpDir("vsrc-offjson")
    TimeTravel.init(spark, t, df((0L, "a", 0.0)), "part")
    TimeTravel.append(spark, t,
      (1L to 40L).map(i => (i, s"p${i % 4}", i.toDouble))
        .toDF("id", "part", "v"), "part") // v2: 4 files x 10 rows
    val src = new VersionedTableSource(spark.sqlContext, t,
      sinceVersion = Some(1), changeFeed = false,
      maxVersionsPerTrigger = None, maxRowsPerTrigger = Some(15L),
      schema = TimeTravel.readVersion(spark, t, 2).schema)
    // a 15-row budget admits one 10-row file per trigger (the next file
    // would exceed it; only the first file ever over-admits)
    val o1 = src.latestOffset(null, src.getDefaultReadLimit)
      .asInstanceOf[VersionOffset]
    assert(o1 === VersionOffset(2, 1))
    assert(VersionOffset.fromJson(o1.json) === o1, "offset json round-trip")
    // a RESTART hands back the checkpointed json as a SerializedOffset;
    // admission and the batch must continue exactly from the file position
    val restored = org.apache.spark.sql.execution.streaming
      .SerializedOffset(o1.json)
    val o2 = src.latestOffset(restored, src.getDefaultReadLimit)
      .asInstanceOf[VersionOffset]
    assert(o2 === VersionOffset(2, 2))
    def batchCount(df: org.apache.spark.sql.DataFrame): Long =
      org.apache.spark.sql.graftshim.StreamingDataFrame
        .asStaticBatch(df).count()
    assert(batchCount(src.getBatch(Some(restored), o2)) === 10,
      "the window is exactly the files between the two positions")
    // walk to the end: positions advance file by file, finishing on a
    // COMPLETE offset whose json is the bare version number
    // (pre-row-admission checkpoints restart cleanly)
    val o3 = src.latestOffset(o2, src.getDefaultReadLimit)
      .asInstanceOf[VersionOffset]
    val o4 = src.latestOffset(o3, src.getDefaultReadLimit)
      .asInstanceOf[VersionOffset]
    assert(o3 === VersionOffset(2, 3) && o4 === VersionOffset(2))
    assert(o4.json === "2")
    assert(batchCount(src.getBatch(Some(o3), o4)) === 10)
    // caught up: the cursor comes back unchanged, no phantom batch
    assert(src.latestOffset(o4, src.getDefaultReadLimit) === o4)
  }

  test("column rename mid-stream: the RUNNING stream fails loudly; a restart resumes from the same cursor under the new names, no gap, no re-delivery") {
    import org.apache.spark.sql.graftshim.StreamingDataFrame
    val t = tmpDir("vsrc-rename")
    TimeTravel.init(spark, t, df((1L, "a", 1.0)), "part")
    TimeTravel.append(spark, t, df((2L, "a", 2.0)), "part") // v2
    // a RUNNING stream pinned to the PRE-rename names, cursor at v2
    val running = new VersionedTableSource(spark.sqlContext, t,
      sinceVersion = Some(1), changeFeed = false,
      maxVersionsPerTrigger = None, maxRowsPerTrigger = None,
      schema = TimeTravel.readVersion(spark, t, 2).schema)
    val o2 = running.latestOffset(null, running.getDefaultReadLimit)
      .asInstanceOf[VersionOffset]
    assert(o2.version === 2)
    assert(StreamingDataFrame.asStaticBatch(
      running.getBatch(None, o2)).count() >= 1) // v2 delivered
    TimeTravel.renameColumn(spark, t, "v", "w")             // v3
    TimeTravel.append(spark, t,
      Seq((3L, "a", 3.0)).toDF("id", "part", "w"), "part")  // v4
    // the running stream would silently NULL-fill `w` into `v` — it
    // must fail with the RESTART instruction instead
    val e = intercept[IllegalStateException] {
      val end = running.latestOffset(o2, running.getDefaultReadLimit)
        .asInstanceOf[VersionOffset]
      StreamingDataFrame.asStaticBatch(
        running.getBatch(Some(o2), end)).count()
    }
    assert(e.getMessage.contains("RESTART the stream"))
    // the RESTARTED stream pins the post-rename schema (sourceSchema
    // reads the log's latest) and resumes from the SAME checkpoint
    // cursor: the rename commit is metadata-only from its seat, v4
    // delivers under the new name — id 2 not re-delivered, id 3 not lost
    val restarted = new VersionedTableSource(spark.sqlContext, t,
      sinceVersion = Some(1), changeFeed = false,
      maxVersionsPerTrigger = None, maxRowsPerTrigger = None,
      schema = VersionedTableSourceProvider.tableSchema(spark, t,
        changeFeed = false))
    val end = restarted.latestOffset(o2, restarted.getDefaultReadLimit)
      .asInstanceOf[VersionOffset]
    val batch = StreamingDataFrame.asStaticBatch(
      restarted.getBatch(Some(o2), end))
    assert(batch.columns.contains("w") && !batch.columns.contains("v"))
    assert(batch.select("id").as[Long].collect().toSeq === Seq(3L))
    // and a FRESH stream crossing the rename from v1 delivers the whole
    // tail under the new names — pre-rename files project through the
    // mapping, nothing NULL-fills
    val out2 = tmpDir("vsrc-rename-out2")
    val ck2 = tmpDir("vsrc-rename-ck2")
    EventsStream.replayToParquet(
      VersionedStream.readStream(spark, t, sinceVersion = Some(1)),
      out2, ck2)
    assert(outIds(out2) === Seq(2L, 3L))
    val fresh = spark.read.parquet(out2)
    assert(fresh.columns.contains("w"))
    assert(fresh.filter(col("id") === 2L).select("w")
      .as[Double].head() === 2.0, "pre-rename rows carry their values " +
        "under the new name, not NULLs")
  }

  test("CDC row admission: a fat captured rewrite splits across triggers at change-file boundaries, exactly-once") {
    import org.apache.spark.sql.graftshim.StreamingDataFrame
    val t = tmpDir("vsrc-rows-cdc")
    TimeTravel.init(spark, t,
      (1L to 30L).map(i => (i, "a", i.toDouble)).toDF("id", "part", "v"),
      "part")
    // captured UPDATE: pre- and post-image frames land as separate
    // parquet files in the change dir — the unit boundaries the
    // admission walk packs against
    TimeTravel.updateWhere(spark, t, col("id") <= 20L,
      Map("v" -> (col("v") + lit(100.0))), "part",
      changeFeed = true) // v2: 40 change rows in ≥ 2 files
    val changeRoot = new java.io.File(s"$t/_change")
    val nChangeFiles = changeRoot.listFiles().head.listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(nChangeFiles >= 2, s"staging precondition: expected multiple " +
      s"change-capture files, got $nChangeFiles")
    def mkSrc() = new VersionedTableSource(spark.sqlContext, t,
      sinceVersion = Some(1), changeFeed = true,
      maxVersionsPerTrigger = None, maxRowsPerTrigger = Some(20L),
      schema = VersionedTableSourceProvider.tableSchema(spark, t,
        changeFeed = true))
    val src = mkSrc()
    // trigger 1: the 20-row budget admits only the first capture file
    val o1 = src.latestOffset(null, src.getDefaultReadLimit)
      .asInstanceOf[VersionOffset]
    assert(!o1.complete && o1.version === 2,
      s"the fat CDC commit must split mid-version, got $o1")
    val b1 = StreamingDataFrame.asStaticBatch(src.getBatch(None, o1))
      .select("id", TimeTravel.ChangeTypeCol).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(b1.nonEmpty && b1.length < 40, "a strict subset per trigger")
    // trigger 2+: walk to completion; the union is EXACTLY the whole
    // window — no row lost at the split, none duplicated
    var cur = o1
    val rest = Seq.newBuilder[(Long, String)]
    var steps = 0
    while ({
      val nxt = src.latestOffset(cur, src.getDefaultReadLimit)
        .asInstanceOf[VersionOffset]
      val advanced = nxt != cur
      if (advanced) {
        rest ++= StreamingDataFrame.asStaticBatch(
            src.getBatch(Some(cur), nxt))
          .select("id", TimeTravel.ChangeTypeCol).collect()
          .map(r => (r.getLong(0), r.getString(1)))
        cur = nxt; steps += 1
      }
      advanced && steps < 10
    }) ()
    val streamed = (b1 ++ rest.result()).sorted.toSeq
    val whole = TimeTravel.readChangesSince(spark, t, 1, 2)
      .select("id", TimeTravel.ChangeTypeCol).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(streamed === whole)
    // restart mid-version from the checkpointed json: no re-delivery
    val restarted = mkSrc()
    val restored = org.apache.spark.sql.execution.streaming
      .SerializedOffset(o1.json)
    val o2 = restarted.latestOffset(restored,
      restarted.getDefaultReadLimit).asInstanceOf[VersionOffset]
    val resumed = StreamingDataFrame.asStaticBatch(
        restarted.getBatch(Some(restored), o2))
      .select("id", TimeTravel.ChangeTypeCol).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert((b1.toSet intersect resumed.toSet).isEmpty,
      "a restart mid-version must not re-deliver the consumed units")
    // a mixed partial-CDC + append window composes: append v3, read
    // from the mid-v2 cursor with a big budget in one batch
    TimeTravel.append(spark, t,
      (31L to 35L).map(i => (i, "a", i.toDouble)).toDF("id", "part", "v"),
      "part") // v3
    val wide = new VersionedTableSource(spark.sqlContext, t,
      sinceVersion = Some(1), changeFeed = true,
      maxVersionsPerTrigger = None, maxRowsPerTrigger = Some(1000L),
      schema = VersionedTableSourceProvider.tableSchema(spark, t,
        changeFeed = true))
    val o3 = wide.latestOffset(restored, wide.getDefaultReadLimit)
      .asInstanceOf[VersionOffset]
    assert(o3 === VersionOffset(3))
    val mixed = StreamingDataFrame.asStaticBatch(
        wide.getBatch(Some(restored), o3))
      .groupBy(col(TimeTravel.ChangeTypeCol)).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mixed.get("insert") === Some(5L))
    assert((mixed.getOrElse("update_preimage", 0L) +
      mixed.getOrElse("update_postimage", 0L)) === (40L - b1.length),
      s"the unconsumed capture units deliver exactly once, got $mixed")
  }

  test("restart-resume: a restarted stream continues from its checkpoint " +
      "with no re-delivery and no gap") {
    val t = tmpDir("vsrc-resume")
    TimeTravel.init(spark, t, df((1L, "a", 1.0)), "part")
    TimeTravel.append(spark, t, df((2L, "a", 2.0)), "part") // v2
    TimeTravel.append(spark, t, df((3L, "b", 3.0)), "part") // v3
    val out = tmpDir("vsrc-resume-out")
    val ck = tmpDir("vsrc-resume-ck")
    def run(): Unit = EventsStream.replayToParquet(
      VersionedStream.readStream(spark, t, sinceVersion = Some(1),
        maxVersionsPerTrigger = Some(1)), out, ck)
    run()
    assert(outIds(out) === Seq(2L, 3L))
    // the table moves on while the stream is down
    TimeTravel.append(spark, t, df((4L, "a", 4.0)), "part") // v4
    TimeTravel.append(spark, t, df((5L, "b", 5.0)), "part") // v5
    run()
    // each appended row exactly once across both runs
    assert(outIds(out) === Seq(2L, 3L, 4L, 5L))
    // and an idle restart (no new commits) delivers nothing
    run()
    assert(outIds(out) === Seq(2L, 3L, 4L, 5L))
  }

  test("snapshot mode: the first batch is the latest version (upsert " +
      "history included), then the stream tails appends") {
    val t = tmpDir("vsrc-snap")
    TimeTravel.init(spark, t, df((1L, "a", 1.0), (2L, "b", 2.0)), "part")
    TimeTravel.upsert(spark, t, df((1L, "a", 10.0)), "id", "part") // v2
    val out = tmpDir("vsrc-snap-out")
    val ck = tmpDir("vsrc-snap-ck")
    def run(): Unit = EventsStream.replayToParquet(
      VersionedStream.readStream(spark, t), out, ck)
    run()
    val snap = spark.read.parquet(out)
    assert(snap.count() === 2)
    // the upserted value, not v1's: the snapshot is the LATEST version
    assert(snap.filter(col("id") === 1L).select("v").as[Double].head() === 10.0)
    // resume: appends after the snapshot flow as windows
    TimeTravel.append(spark, t, df((3L, "a", 3.0)), "part") // v3
    run()
    assert(outIds(out) === Seq(1L, 2L, 3L))
  }

  test("changeFeed mode: the stream delivers exactly the batch CDC feed, " +
      "pre/post images and commit versions included") {
    val t = tmpDir("vsrc-cdc")
    TimeTravel.init(spark, t, df((1L, "a", 1.0), (2L, "b", 2.0),
      (3L, "a", 3.0)), "part")
    TimeTravel.upsert(spark, t, df((1L, "a", 10.0)), "id", "part",
      changeFeed = true) // v2
    TimeTravel.delete(spark, t, Seq(2L).toDF("id"), "id", "part",
      changeFeed = true) // v3
    TimeTravel.append(spark, t, df((4L, "b", 4.0)), "part") // v4
    val out = tmpDir("vsrc-cdc-out")
    val ck = tmpDir("vsrc-cdc-ck")
    EventsStream.replayToParquet(
      VersionedStream.readStream(spark, t, sinceVersion = Some(1),
        changeFeed = true, maxVersionsPerTrigger = Some(1)), out, ck)
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("id"), r.getAs[Double]("v"),
        r.getAs[String](TimeTravel.ChangeTypeCol),
        r.getAs[Int](TimeTravel.CommitVersionCol))
    val streamed = spark.read.parquet(out).collect().map(key).toSet
    val batch = TimeTravel.readChangesSince(spark, t, 1)
      .collect().map(key).toSet
    assert(streamed === batch)
    assert(streamed.exists(_._3 == "update_preimage"))
    assert(streamed.exists(_._3 == "delete"))
    assert(nBatches(ck) >= 3)
  }

  test("schema evolution: pre-evolution appends NULL-fill the added " +
      "column; post-evolution rows carry it") {
    val t = tmpDir("vsrc-evolve")
    TimeTravel.init(spark, t, df((1L, "a", 1.0)), "part")
    TimeTravel.append(spark, t, df((2L, "a", 2.0)), "part") // v2: pre
    TimeTravel.append(spark, t,
      Seq((3L, "b", 3.0, "x")).toDF("id", "part", "v", "w"),
      "part", evolveSchema = true) // v3: adds w
    val out = tmpDir("vsrc-evolve-out")
    val ck = tmpDir("vsrc-evolve-ck")
    EventsStream.replayToParquet(
      VersionedStream.readStream(spark, t, sinceVersion = Some(1)), out, ck)
    val got = spark.read.parquet(out)
    assert(got.columns.contains("w"))
    val byId = got.collect()
      .map(r => r.getAs[Long]("id") -> Option(r.getAs[String]("w"))).toMap
    assert(byId === Map(2L -> None, 3L -> Some("x")))
  }

  test("append-mode sink is exactly-once: re-delivered batches skip, a " +
      "restarted sink recovers its mark from the log") {
    import org.apache.spark.sql.streaming.OutputMode
    val t = tmpDir("vsink-eo")
    val provider = new VersionedTableSourceProvider
    def mkSink() = provider.createSink(spark.sqlContext,
      Map("path" -> t, "partCol" -> "part", "streamId" -> "s1"),
      Nil, OutputMode.Append())
    val sink = mkSink()
    sink.addBatch(0, df((1L, "a", 1.0)))
    sink.addBatch(1, df((2L, "a", 2.0)))
    sink.addBatch(1, df((2L, "a", 2.0))) // same-instance re-delivery
    assert(TimeTravel.latestVersion(spark, t) === 2)
    // a fresh sink (crash-restart) recovers the high-water mark from
    // the commit records' txn markers, not from JVM state
    val sink2 = mkSink()
    sink2.addBatch(1, df((2L, "a", 2.0))) // below the mark: skipped
    assert(TimeTravel.latestVersion(spark, t) === 2)
    sink2.addBatch(2, df((3L, "b", 3.0))) // above it: lands
    val ids = TimeTravel.readVersion(spark, t, 3)
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids === Seq(1L, 2L, 3L))
  }

  test("declarative medallion: versioned source into versioned sink, " +
      "zero foreachBatch glue, incremental on re-run") {
    val bronze = tmpDir("vsink-bronze")
    TimeTravel.init(spark, bronze, df((1L, "a", 1.0)), "part")
    TimeTravel.append(spark, bronze, df((2L, "a", 2.0)), "part") // v2
    TimeTravel.append(spark, bronze, df((3L, "b", 3.0)), "part") // v3
    val silver = tmpDir("vsink-silver")
    val ck = tmpDir("vsink-ck")
    def run(): Unit = VersionedStream.replayToTable(
      VersionedStream.readStream(spark, bronze, sinceVersion = Some(1),
        maxVersionsPerTrigger = Some(1)),
      silver, ck, partCol = "part")
    run()
    def silverIds() = TimeTravel.readVersion(spark, silver,
        TimeTravel.latestVersion(spark, silver))
      .select("id").as[Long].collect().sorted.toSeq
    assert(silverIds() === Seq(2L, 3L))
    // one commit per micro-batch on the silver side too
    assert(TimeTravel.latestVersion(spark, silver) === 2)
    // bronze moves on; the re-run ships exactly the delta
    TimeTravel.append(spark, bronze, df((4L, "a", 4.0)), "part") // v4
    run()
    assert(silverIds() === Seq(2L, 3L, 4L))
  }

  test("continuous tailing: a ProcessingTime stream picks up commits " +
      "landed while it runs — the live deployment shape") {
    val t = tmpDir("vsrc-live")
    TimeTravel.init(spark, t, df((1L, "a", 1.0)), "part")
    TimeTravel.append(spark, t, df((2L, "a", 2.0)), "part") // v2
    val out = tmpDir("vsrc-live-out")
    val ck = tmpDir("vsrc-live-ck")
    val q = VersionedStream.readStream(spark, t, sinceVersion = Some(1))
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("50 milliseconds"))
      .start()
    try {
      q.processAllAvailable()
      assert(outIds(out) === Seq(2L))
      // the table moves WHILE the stream runs — no restart
      TimeTravel.append(spark, t, df((3L, "b", 3.0)), "part") // v3
      TimeTravel.append(spark, t, df((4L, "a", 4.0)), "part") // v4
      q.processAllAvailable()
      assert(outIds(out) === Seq(2L, 3L, 4L))
    } finally q.stop()
  }

  test("append-mode sink refuses Update/Complete output modes — " +
      "re-emitted aggregate rows would silently duplicate") {
    import org.apache.spark.sql.streaming.OutputMode
    val provider = new VersionedTableSourceProvider
    for (bad <- Seq(OutputMode.Update(), OutputMode.Complete())) {
      val e = intercept[IllegalArgumentException] {
        provider.createSink(spark.sqlContext,
          Map("path" -> tmpDir("vsink-om"), "partCol" -> "part",
            "streamId" -> "s1"), Nil, bad)
      }
      assert(e.getMessage.contains("mode=upsert"))
    }
    // upsert mode accepts Update (the totals-merge shape)
    provider.createSink(spark.sqlContext,
      Map("path" -> tmpDir("vsink-om"), "partCol" -> "part",
        "mode" -> "upsert", "keyCol" -> "id", "streamId" -> "s1"),
      Nil, OutputMode.Update())
  }

  test("sink accepts .partitionBy as the partition declaration and " +
      "refuses a disagreeing partCol option") {
    import org.apache.spark.sql.streaming.OutputMode
    val provider = new VersionedTableSourceProvider
    val t = tmpDir("vsink-pby")
    val sink = provider.createSink(spark.sqlContext,
      Map("path" -> t, "streamId" -> "s1"), Seq("part"),
      OutputMode.Append())
    sink.addBatch(0, df((1L, "a", 1.0)))
    assert(TimeTravel.latestVersion(spark, t) === 1)
    intercept[IllegalArgumentException] {
      provider.createSink(spark.sqlContext,
        Map("path" -> t, "partCol" -> "other", "streamId" -> "s1"),
        Seq("part"), OutputMode.Append())
    }
    // multi-column partitionBy is a valid layout declaration now; it
    // must agree with an explicit partCol option when both are given
    provider.createSink(spark.sqlContext,
      Map("path" -> tmpDir("vsink-pby2"), "streamId" -> "s1"),
      Seq("a", "b"), OutputMode.Append())
    intercept[IllegalArgumentException] {
      provider.createSink(spark.sqlContext,
        Map("path" -> t, "partCol" -> "a", "streamId" -> "s1"),
        Seq("a", "b"), OutputMode.Append())
    }
  }

  test("upsert-mode sink: Update-mode totals merge per micro-batch; " +
      "result equals the batch aggregation") {
    import org.apache.spark.sql.streaming.OutputMode
    val bronze = tmpDir("vsink-up-bronze")
    TimeTravel.init(spark, bronze, df((1L, "a", 1.0)), "part")
    TimeTravel.append(spark, bronze,
      df((2L, "a", 2.0), (3L, "b", 3.0)), "part") // v2
    TimeTravel.append(spark, bronze,
      df((4L, "a", 4.0), (5L, "b", 5.0)), "part") // v3
    val silver = tmpDir("vsink-up-silver")
    val ck = tmpDir("vsink-up-ck")
    val totals = VersionedStream.readStream(spark, bronze,
        sinceVersion = Some(1), maxVersionsPerTrigger = Some(1))
      .groupBy(col("part"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("total"))
      .select(col("part"), col("n"), col("total"),
        col("part").as("bucket"))
    VersionedStream.replayToTable(totals, silver, ck, partCol = "bucket",
      mode = "upsert", keyCol = Some("part"),
      outputMode = OutputMode.Update())
    val got = TimeTravel.readVersion(spark, silver,
        TimeTravel.latestVersion(spark, silver))
      .select("part", "n", "total").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === Set(("a", 2L, 6.0), ("b", 2L, 8.0)))
  }

  test("restart after a rename: row-admitted batches ENDING BEFORE the " +
      "rename commit still deliver the renamed column's values (pinned-" +
      "version reads, never batch-end NULL-fill)") {
    import org.apache.spark.sql.graftshim.StreamingDataFrame
    val t = tmpDir("vsrc-ren-backlog")
    TimeTravel.init(spark, t, df((1L, "a", 1.0)), "part")
    TimeTravel.append(spark, t, df((2L, "a", 2.0)), "part")  // v2 (pre)
    TimeTravel.renameColumn(spark, t, "v", "w")              // v3
    TimeTravel.append(spark, t,
      Seq((3L, "a", 3.0)).toDF("id", "part", "w"), "part")   // v4 (post)
    // restarted stream pinned POST-rename, draining the backlog from v1
    // with a 1-row budget: the first batch's END version (2) precedes
    // the rename commit (3) — exactly the window that used to NULL-fill
    val src = new VersionedTableSource(spark.sqlContext, t,
      sinceVersion = Some(1), changeFeed = false,
      maxVersionsPerTrigger = None, maxRowsPerTrigger = Some(1L),
      schema = VersionedTableSourceProvider.tableSchema(spark, t,
        changeFeed = false))
    val o1 = src.latestOffset(null, src.getDefaultReadLimit)
      .asInstanceOf[VersionOffset]
    assert(o1.version === 2, s"first batch must end before the rename, got $o1")
    val b1 = StreamingDataFrame.asStaticBatch(src.getBatch(None, o1))
      .select("id", "w").as[(Long, Option[Double])].collect().toMap
    assert(b1 === Map(2L -> Some(2.0)),
      "the pre-rename add must deliver its value under the NEW name")
    // drain the rest: the rename commit is metadata-only from the
    // pinned seat, v4 delivers; union has no NULLs and no gaps
    var cur = o1
    val rest = Seq.newBuilder[(Long, Option[Double])]
    var advanced = true
    while (advanced) {
      val nxt = src.latestOffset(cur, src.getDefaultReadLimit)
        .asInstanceOf[VersionOffset]
      advanced = nxt != cur
      if (advanced) {
        rest ++= StreamingDataFrame.asStaticBatch(src.getBatch(Some(cur), nxt))
          .select("id", "w").as[(Long, Option[Double])].collect()
        cur = nxt
      }
    }
    assert((b1 ++ rest.result()) === Map(2L -> Some(2.0), 3L -> Some(3.0)))
  }

  test("CDC restart across a rename: captured rewrites and append adds " +
      "from before the rename deliver under the new name, no NULLs") {
    import org.apache.spark.sql.graftshim.StreamingDataFrame
    val t = tmpDir("vsrc-ren-cdc")
    TimeTravel.init(spark, t, df((1L, "a", 1.0), (2L, "a", 2.0)), "part")
    TimeTravel.updateWhere(spark, t, col("id") === 1L,
      Map("v" -> lit(10.0)), "part", changeFeed = true)       // v2 capture
    TimeTravel.append(spark, t, df((3L, "a", 3.0)), "part")   // v3 (pre)
    TimeTravel.renameColumn(spark, t, "v", "w")               // v4
    TimeTravel.append(spark, t,
      Seq((4L, "a", 4.0)).toDF("id", "part", "w"), "part")    // v5 (post)
    val src = new VersionedTableSource(spark.sqlContext, t,
      sinceVersion = Some(1), changeFeed = true,
      maxVersionsPerTrigger = Some(1), maxRowsPerTrigger = None,
      schema = VersionedTableSourceProvider.tableSchema(spark, t,
        changeFeed = true))
    var cur: VersionOffset = null
    val got = Seq.newBuilder[(Long, Option[Double], String)]
    var advanced = true
    while (advanced) {
      val nxt = src.latestOffset(cur, src.getDefaultReadLimit)
        .asInstanceOf[VersionOffset]
      advanced = nxt != cur
      if (advanced) {
        got ++= StreamingDataFrame.asStaticBatch(
            src.getBatch(Option(cur), nxt))
          .select(col("id"), col("w"), col(TimeTravel.ChangeTypeCol))
          .as[(Long, Option[Double], String)].collect()
        cur = nxt
      }
    }
    val rows = got.result()
    assert(rows.forall(_._2.nonEmpty),
      s"no delivered change row may NULL-fill the renamed column: $rows")
    assert(rows.toSet === Set(
      (1L, Some(1.0), "update_preimage"), (1L, Some(10.0), "update_postimage"),
      (3L, Some(3.0), "insert"), (4L, Some(4.0), "insert")))
  }

  test("a backlog holding TWO renames drains after one restart — no " +
      "permanently unreadable window") {
    val t = tmpDir("vsrc-2ren")
    TimeTravel.init(spark, t, df((1L, "a", 1.0)), "part")
    TimeTravel.append(spark, t, df((2L, "a", 2.0)), "part")   // v2
    TimeTravel.renameColumn(spark, t, "v", "w")               // v3
    TimeTravel.append(spark, t,
      Seq((3L, "a", 3.0)).toDF("id", "part", "w"), "part")    // v4
    TimeTravel.renameColumn(spark, t, "w", "u")               // v5
    TimeTravel.append(spark, t,
      Seq((4L, "a", 4.0)).toDF("id", "part", "u"), "part")    // v6
    // a single restarted stream (pinned at the tip: id, part, u) drains
    // the whole backlog — the round-14 per-commit exact-schema check
    // made the FIRST rename commit permanently unreadable here
    val out = tmpDir("vsrc-2ren-out")
    val ck = tmpDir("vsrc-2ren-ck")
    EventsStream.replayToParquet(
      VersionedStream.readStream(spark, t, sinceVersion = Some(1),
        maxVersionsPerTrigger = Some(1)), out, ck)
    val gotRows = spark.read.parquet(out).select("id", "u")
      .as[(Long, Option[Double])].collect().toMap
    assert(gotRows === Map(2L -> Some(2.0), 3L -> Some(3.0),
      4L -> Some(4.0)))
  }

  test("maxBytesPerTrigger: a fat commit splits by the log's recorded " +
      "byte sizes, mid-version offsets resume exactly") {
    import org.apache.spark.sql.graftshim.StreamingDataFrame
    val t = tmpDir("vsrc-bytes")
    TimeTravel.init(spark, t, df((0L, "a", 0.0)), "part")
    TimeTravel.append(spark, t,
      (1L to 40L).map(i => (i, s"p${i % 4}", i.toDouble))
        .toDF("id", "part", "v"), "part") // v2: 4 files
    // one file's recorded size (from the log, no fs access)
    val oneFile = new java.io.File(s"$t/data").listFiles()
      .filter(_.isDirectory).head.listFiles()
      .filter(_.getName.endsWith(".parquet")).head.length()
    def mkSrc() = new VersionedTableSource(spark.sqlContext, t,
      sinceVersion = Some(1), changeFeed = false,
      maxVersionsPerTrigger = None, maxRowsPerTrigger = None,
      schema = TimeTravel.readVersion(spark, t, 2).schema,
      maxBytesPerTrigger = Some(oneFile + oneFile / 2))
    val src = mkSrc()
    // a 1.5-file byte budget admits one file per trigger
    val o1 = src.latestOffset(null, src.getDefaultReadLimit)
      .asInstanceOf[VersionOffset]
    assert(o1 === VersionOffset(2, 1), s"byte budget must split: $o1")
    def batchCount(s: Option[VersionOffset], e: VersionOffset): Long =
      StreamingDataFrame.asStaticBatch(
        src.getBatch(s.map(identity), e)).count()
    assert(batchCount(None, o1) === 10)
    // restart from the checkpointed mid-version json: exact resume
    val restored = org.apache.spark.sql.execution.streaming
      .SerializedOffset(o1.json)
    val fresh = mkSrc()
    val o2 = fresh.latestOffset(restored, fresh.getDefaultReadLimit)
      .asInstanceOf[VersionOffset]
    assert(o2 === VersionOffset(2, 2))
    assert(StreamingDataFrame.asStaticBatch(
      fresh.getBatch(Some(restored), o2)).count() === 10)
    // walk to completion: all 40 rows exactly once
    var cur: VersionOffset = o2
    var total = 20L
    var advanced = true
    while (advanced) {
      val nxt = fresh.latestOffset(cur, fresh.getDefaultReadLimit)
        .asInstanceOf[VersionOffset]
      advanced = nxt != cur
      if (advanced) {
        total += StreamingDataFrame.asStaticBatch(
          fresh.getBatch(Some(cur), nxt)).count()
        cur = nxt
      }
    }
    assert(total === 40L && cur === VersionOffset(2))
  }

  test("a vacuumed-away window fails loudly on restart — never a silent gap") {
    val t = tmpDir("vsrc-vac")
    TimeTravel.init(spark, t, df((1L, "a", 1.0)), "part")
    TimeTravel.append(spark, t, df((2L, "a", 2.0)), "part") // v2
    val out = tmpDir("vsrc-vac-out")
    val ck = tmpDir("vsrc-vac-ck")
    def run(): Unit = EventsStream.replayToParquet(
      VersionedStream.readStream(spark, t, sinceVersion = Some(1)), out, ck)
    run() // cursor now at v2
    (3 to 12).foreach(i => // past a checkpoint so vacuum can drop v3/v4
      TimeTravel.append(spark, t, df((i.toLong, "a", i.toDouble)), "part"))
    TimeTravel.vacuum(spark, t, keepFrom = 10, orphanMinAgeMs = 0L)
    val e = intercept[Exception](run())
    def messages(x: Throwable): Seq[String] =
      Option(x).toSeq.flatMap(t => Option(t.getMessage).toSeq ++
        messages(t.getCause))
    assert(messages(e).exists(_.contains("vacuumed away")))
    // nothing partial was delivered by the failed run
    assert(outIds(out) === Seq(2L))
  }
}
