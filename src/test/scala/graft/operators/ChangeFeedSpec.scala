package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Change-data-feed invariants: rewrite commits made with
  * `changeFeed = true` capture exact row-level pre/post images at
  * commit time, appends deliver their add files as inserts, windows
  * compose, uncaptured rewrites refuse, and vacuum reclaims
  * unaddressable change rows. */
class ChangeFeedSpec extends SparkSpec {

  import spark.implicits._

  private def changes(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("part"),
      r.getAs[Double]("v"), r.getAs[String](TimeTravel.ChangeTypeCol),
      r.getAs[Int](TimeTravel.CommitVersionCol))).toSet

  private def stage(): String = {
    val dir = tmpDir("tt-cdf")
    TimeTravel.init(spark, dir,
      Seq((1L, "p1", 10.0), (2L, "p1", 20.0), (3L, "p2", 30.0))
        .toDF("id", "part", "v"), "part")
    dir
  }

  test("upsert captures update pre/post images and inserts exactly") {
    val dir = stage()
    // 1 is updated in place, 3 moves partition, 9 is brand new
    TimeTravel.upsert(spark, dir,
      Seq((1L, "p1", 11.0), (3L, "p1", 33.0), (9L, "p2", 90.0))
        .toDF("id", "part", "v"), "id", "part", changeFeed = true)
    val feed = TimeTravel.readChangesSince(spark, dir, 1)
    assert(changes(feed) === Set(
      (1L, "p1", 10.0, "update_preimage", 2),
      (1L, "p1", 11.0, "update_postimage", 2),
      (3L, "p2", 30.0, "update_preimage", 2),
      (3L, "p1", 33.0, "update_postimage", 2),
      (9L, "p2", 90.0, "insert", 2)))
  }

  test("delete captures the deleted rows; appends deliver as inserts; compact delivers nothing") {
    val dir = stage()
    TimeTravel.append(spark, dir,
      Seq((4L, "p2", 40.0)).toDF("id", "part", "v"), "part")
    TimeTravel.delete(spark, dir, Seq(2L, 4L).toDF("id"), "id", "part",
      changeFeed = true)
    TimeTravel.append(spark, dir,
      Seq((5L, "p1", 50.0)).toDF("id", "part", "v"), "part")
    TimeTravel.compact(spark, dir, "part")
    val feed = TimeTravel.readChangesSince(spark, dir, 1)
    assert(changes(feed) === Set(
      (4L, "p2", 40.0, "insert", 2),
      (2L, "p1", 20.0, "delete", 3),
      (4L, "p2", 40.0, "delete", 3),
      (5L, "p1", 50.0, "insert", 4)))
    // windows compose: (1,3] ++ (3,latest] = (1,latest]
    val latest = TimeTravel.latestVersion(spark, dir)
    val a = changes(TimeTravel.readChangesSince(spark, dir, 1, 3))
    val b = changes(TimeTravel.readChangesSince(spark, dir, 3, latest))
    assert((a ++ b) === changes(feed))
    assert(a.intersect(b).isEmpty)
  }

  test("a rewrite committed without changeFeed refuses the window loudly") {
    val dir = stage()
    TimeTravel.upsert(spark, dir,
      Seq((1L, "p1", 11.0)).toDF("id", "part", "v"), "id", "part")
    val e = intercept[IllegalArgumentException] {
      TimeTravel.readChangesSince(spark, dir, 1).collect()
    }
    assert(e.getMessage.contains("recorded no change rows"))
  }

  test("changes captured before a schema evolution NULL-fill the added column") {
    val dir = stage()
    TimeTravel.delete(spark, dir, Seq(2L).toDF("id"), "id", "part",
      changeFeed = true)
    TimeTravel.upsert(spark, dir,
      Seq((1L, "p1", 12.0, "x")).toDF("id", "part", "v", "tag"),
      "id", "part", evolveSchema = true, changeFeed = true)
    val feed = TimeTravel.readChangesSince(spark, dir, 1)
    assert(feed.columns.toSeq ===
      Seq("id", "part", "v", "tag", TimeTravel.ChangeTypeCol,
        TimeTravel.CommitVersionCol))
    val del = feed.filter(col(TimeTravel.ChangeTypeCol) === "delete")
      .head()
    assert(del.getAs[Long]("id") === 2L && del.isNullAt(del.fieldIndex("tag")))
    val post = feed
      .filter(col(TimeTravel.ChangeTypeCol) === "update_postimage").head()
    assert(post.getAs[String]("tag") === "x")
  }

  test("vacuum reclaims change rows below the floor; windows crossing the floor refuse") {
    val dir = stage()
    TimeTravel.delete(spark, dir, Seq(2L).toDF("id"), "id", "part",
      changeFeed = true) // v2
    TimeTravel.append(spark, dir,
      Seq((7L, "p1", 70.0)).toDF("id", "part", "v"), "part") // v3
    TimeTravel.vacuum(spark, dir, 2)
    // (2, 3] still works — the feed never needs the floor's own record
    assert(changes(TimeTravel.readChangesSince(spark, dir, 2)) ===
      Set((7L, "p1", 70.0, "insert", 3)))
    intercept[IllegalArgumentException] {
      TimeTravel.readChangesSince(spark, dir, 1).collect()
    }
    // the dropped version's change dir is physically gone
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "_change", "2")))
  }
}
