package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Column mapping ([[TimeTravel.renameColumn]] /
  * [[TimeTravel.dropColumn]]): metadata-only rename/drop, per-version
  * names under time travel, physical-name stats and writes, feed
  * refusal, and the resurrection guard. */
class ColumnMappingSpec extends SparkSpec {

  import spark.implicits._

  private def stage(): String = {
    val t = tmpDir("colmap")
    TimeTravel.init(spark, t,
      Seq((1L, "a", 10.0, "u"), (2L, "b", 20.0, "v"))
        .toDF("k", "p", "x", "s"), "p")
    TimeTravel.append(spark, t,
      Seq((3L, "a", 30.0, "w")).toDF("k", "p", "x", "s"), "p") // v2
    t
  }
  private def latestDf(t: String) =
    TimeTravel.readVersion(spark, t, TimeTravel.latestVersion(spark, t))

  test("rename is metadata-only: zero files rewrite, values ride, old versions keep their own names") {
    val t = stage()
    val filesBefore = TimeTravel.filesAt(spark, t, 2).toSet
    val v = TimeTravel.renameColumn(spark, t, "x", "score") // v3
    assert(TimeTravel.filesAt(spark, t, v).toSet === filesBefore,
      "a rename must not touch a single data file")
    val now = latestDf(t)
    assert(now.columns.toSet === Set("k", "p", "score", "s"))
    assert(now.select("k", "score").as[(Long, Double)].collect().toMap
      === Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0))
    // schema time travel: each version answers with ITS OWN names
    assert(TimeTravel.readVersion(spark, t, 2).columns.contains("x"))
    assert(!TimeTravel.readVersion(spark, t, 2).columns.contains("score"))
  }

  test("writes after a rename land under the physical name and read back logically") {
    val t = stage()
    TimeTravel.renameColumn(spark, t, "x", "score")
    TimeTravel.append(spark, t,
      Seq((4L, "b", 40.0, "z")).toDF("k", "p", "score", "s"), "p")
    TimeTravel.upsert(spark, t,
      Seq((1L, "a", 11.0, "u")).toDF("k", "p", "score", "s"), "k", "p")
    val rows = latestDf(t).select("k", "score").as[(Long, Double)]
      .collect().toMap
    assert(rows === Map(1L -> 11.0, 2L -> 20.0, 3L -> 30.0, 4L -> 40.0))
    // the mixed old/new files agree physically: compaction folds them
    TimeTravel.compact(spark, t, "p")
    assert(latestDf(t).select("k", "score").as[(Long, Double)]
      .collect().toMap === rows)
  }

  test("data skipping prunes on the RENAMED column through pre-rename stats") {
    val t = tmpDir("colmap-skip")
    (0 until 4).foreach { sl =>
      val df = ((sl * 100) until (sl * 100 + 100)).map(i =>
        (i.toLong, "all", i * 1.0)).toDF("k", "p", "x").repartition(1)
      if (sl == 0) TimeTravel.init(spark, t, df, "p")
      else TimeTravel.append(spark, t, df, "p")
    }
    val v = TimeTravel.renameColumn(spark, t, "k", "key")
    val scan = TimeTravel.readVersionSkipping(spark, t, v,
      "key", 110L, 150L)
    assert(scan.filesRead < scan.filesTotal,
      "pre-rename file stats must keep pruning under the new name")
    assert(scan.df.filter(col("key").between(110, 150)).count() === 41)
  }

  test("drop is metadata-only; pre-drop versions still read the column; re-add is refused") {
    val t = stage()
    val filesBefore = TimeTravel.filesAt(spark, t, 2).toSet
    val v = TimeTravel.dropColumn(spark, t, "s") // v3
    assert(TimeTravel.filesAt(spark, t, v).toSet === filesBefore)
    assert(latestDf(t).columns.toSet === Set("k", "p", "x"))
    assert(TimeTravel.readVersion(spark, t, 2)
      .select("s").as[String].collect().sorted === Seq("u", "v", "w"))
    // resurrection guard: a new column named like the dropped one would
    // surface the old files' orphaned values
    val e = intercept[IllegalArgumentException](TimeTravel.append(spark, t,
      Seq((4L, "a", 40.0, "ghost")).toDF("k", "p", "x", "s"), "p",
      evolveSchema = true))
    assert(e.getMessage.contains("RESERVED physical name"))
    // and the same guard covers a renamed-away column's old name
    TimeTravel.renameColumn(spark, t, "x", "score")
    val e2 = intercept[IllegalArgumentException](TimeTravel.append(spark, t,
      Seq((4L, "a", 40.0, 9.0)).toDF("k", "p", "score", "x"), "p",
      evolveSchema = true))
    assert(e2.getMessage.contains("RESERVED physical name"))
  }

  test("partition column and constraint-referenced columns refuse rename/drop") {
    val t = stage()
    intercept[IllegalArgumentException](
      TimeTravel.renameColumn(spark, t, "p", "part2"))
    intercept[IllegalArgumentException](
      TimeTravel.dropColumn(spark, t, "p"))
    TimeTravel.addConstraint(spark, t, "x_pos", "x > 0")
    intercept[IllegalArgumentException](
      TimeTravel.renameColumn(spark, t, "x", "score"))
    intercept[IllegalArgumentException](
      TimeTravel.dropColumn(spark, t, "x"))
    TimeTravel.dropConstraint(spark, t, "x_pos")
    TimeTravel.renameColumn(spark, t, "x", "score") // now fine
    assert(latestDf(t).columns.contains("score"))
  }

  test("batch feeds deliver ACROSS a rename under the end version's names — pre-rename adds project, never NULL-fill") {
    val t = stage()
    val v2 = TimeTravel.latestVersion(spark, t)
    val vRen = TimeTravel.renameColumn(spark, t, "x", "score")
    TimeTravel.append(spark, t,
      Seq((4L, "b", 40.0, "z")).toDF("k", "p", "score", "s"), "p")
    // the window (v2-1, latest] crosses the rename: the v2 add (30.0)
    // was written under physical name `x`; it must come back under the
    // END version's logical name `score` with its VALUE intact
    val feed = TimeTravel.readAppendsSince(spark, t, v2 - 1)
    assert(feed.columns.contains("score") && !feed.columns.contains("x"))
    assert(feed.select("k", "score").as[(Long, Double)].collect().toMap
      === Map(3L -> 30.0, 4L -> 40.0))
    val cdc = TimeTravel.readChangesSince(spark, t, v2 - 1)
    assert(cdc.filter(col(TimeTravel.ChangeTypeCol) === "insert")
      .select("k", "score").as[(Long, Double)].collect().toMap
      === Map(3L -> 30.0, 4L -> 40.0))
    // a window starting AT the mapping commit still delivers
    val after = TimeTravel.readAppendsSince(spark, t, vRen)
    assert(after.select("k", "score").as[(Long, Double)].collect().toSeq
      === Seq((4L, 40.0)))
    // and captured REWRITE changes from before the rename remap onto
    // the new name through the stable physical identity
    TimeTravel.renameColumn(spark, t, "score", "pts")
    val all = TimeTravel.readChangesSince(spark, t, v2 - 1)
    assert(all.columns.contains("pts") && !all.columns.contains("score"))
    assert(all.filter(col("k") === 3L).select("pts").as[Double]
      .collect().toSeq === Seq(30.0), "two renames in one window " +
        "compose — values ride the physical name")
  }

  test("restore across a rename restores the old names; vacuum floor carries the mapping") {
    val t = stage()
    TimeTravel.renameColumn(spark, t, "x", "score") // v3
    TimeTravel.append(spark, t,
      Seq((4L, "a", 40.0, "z")).toDF("k", "p", "score", "s"), "p") // v4
    val vRestored = TimeTravel.restore(spark, t, 2) // v5: content + names of v2
    assert(latestDf(t).columns.toSet === Set("k", "p", "x", "s"))
    assert(latestDf(t).count() === 3)
    // forward again: rename + append, then vacuum to a post-rename floor
    TimeTravel.renameColumn(spark, t, "x", "score2") // v6
    TimeTravel.append(spark, t,
      Seq((5L, "b", 50.0, "q")).toDF("k", "p", "score2", "s"), "p") // v7
    TimeTravel.vacuum(spark, t, keepFrom = vRestored + 1) // floor = v6
    val tip = latestDf(t)
    assert(tip.columns.toSet === Set("k", "p", "score2", "s"))
    assert(tip.select("k", "score2").as[(Long, Double)].collect().toMap
      === Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0, 5L -> 50.0))
    // the floor version itself resolves with the mapping intact
    assert(TimeTravel.readVersion(spark, t, vRestored + 1)
      .columns.contains("score2"))
  }

  test("predicate rewrites work on renamed columns") {
    val t = stage()
    TimeTravel.renameColumn(spark, t, "x", "score")
    TimeTravel.deleteWhere(spark, t, col("score") >= 30.0, "p")
    assert(latestDf(t).select("k").as[Long].collect().sorted
      === Seq(1L, 2L))
    TimeTravel.updateWhere(spark, t, col("k") === 1,
      Map("score" -> lit(99.0)), "p")
    assert(latestDf(t).filter(col("k") === 1).select("score")
      .as[Double].head() === 99.0)
  }

  test("the declarative batch relation reads mapped tables under logical names") {
    val t = stage()
    TimeTravel.renameColumn(spark, t, "x", "score")
    // round 13 refused here; the merge-on-read relation now projects
    // the unchanged physical bytes back to the version's logical names
    val decl = spark.read.format("graft-versioned").option("path", t)
      .load()
    assert(decl.columns.contains("score") && !decl.columns.contains("x"))
    assert(decl.count() === 3)
    // pre-rename versions still read under their OWN names
    val v2 = spark.read.format("graft-versioned").option("path", t)
      .option("versionAsOf", "2").load()
    assert(v2.columns.contains("x") && !v2.columns.contains("score"))
    assert(v2.count() === 3)
  }
}
