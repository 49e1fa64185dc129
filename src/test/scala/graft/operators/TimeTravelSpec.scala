package graft.operators

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Versioned-table invariants: every committed version stays readable
  * after later commits, untouched partitions carry over by file name,
  * emptied partitions vanish from the manifest without physical deletes,
  * commits are exclusive-create, and diffs come from manifests alone. */
class TimeTravelSpec extends SparkSpec {

  import spark.implicits._

  private def stage(): String = {
    val dir = tmpDir("tt-base")
    TimeTravel.init(spark,
      dir,
      Seq((1L, "p1", 10.0), (2L, "p1", 20.0), (3L, "p2", 30.0),
        (4L, "p2", 40.0), (5L, "p3", 50.0)).toDF("id", "part", "v"),
      "part")
    dir
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("id", "part", "v").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("part"),
        r.getAs[Double]("v"))).toSet

  test("old versions stay readable and unchanged after later commits") {
    val dir = stage()
    val v1 = rows(TimeTravel.readVersion(spark, dir, 1))
    val v2 = TimeTravel.upsert(spark, dir,
      Seq((1L, "p1", 11.0), (9L, "p2", 90.0)).toDF("id", "part", "v"),
      "id", "part")
    assert(v2 === 2)
    val v3 = TimeTravel.delete(spark, dir, Seq(3L, 4L).toDF("id"),
      "id", "part")
    assert(v3 === 3)
    // v1 still reads its ORIGINAL state — the whole point
    assert(rows(TimeTravel.readVersion(spark, dir, 1)) === v1)
    assert(rows(TimeTravel.readVersion(spark, dir, 2)) ===
      v1 - ((1L, "p1", 10.0)) + ((1L, "p1", 11.0)) + ((9L, "p2", 90.0)))
    assert(rows(TimeTravel.readVersion(spark, dir, 3)) ===
      Set((1L, "p1", 11.0), (2L, "p1", 20.0), (9L, "p2", 90.0),
        (5L, "p3", 50.0)))
    assert(TimeTravel.latestVersion(spark, dir) === 3)
  }

  test("untouched partitions carry over by file NAME; nothing is physically deleted") {
    val dir = stage()
    def manifest(n: Int) = Files.readAllLines(
      Paths.get(dir, "_graft_log", s"$n.manifest"))
    TimeTravel.upsert(spark, dir,
      Seq((1L, "p1", 11.0)).toDF("id", "part", "v"), "id", "part")
    val m1 = manifest(1); val m2 = manifest(2)
    // p2/p3 files identical entries across versions; p1 files replaced
    assert(m1.stream.filter(f => !f.startsWith("part=p1/")).toArray.toSet
      === m2.stream.filter(f => !f.startsWith("part=p1/")).toArray.toSet)
    assert(m1.stream.filter(_.startsWith("part=p1/")).toArray.toSet
      .intersect(m2.stream.filter(_.startsWith("part=p1/")).toArray.toSet)
      .isEmpty)
    // every v1 file still exists on disk (no vacuum)
    m1.forEach(f => assert(Files.exists(Paths.get(dir, "data", f)), f))
  }

  test("emptying a partition drops it from the manifest only; key moves leave no stale copy") {
    val dir = stage()
    // move 5 (p3's only row) to p1: p3 empties in v2
    TimeTravel.upsert(spark, dir,
      Seq((5L, "p1", 55.0)).toDF("id", "part", "v"), "id", "part")
    val v2 = TimeTravel.readVersion(spark, dir, 2)
    assert(rows(v2).count(_._1 == 5L) === 1)
    assert(v2.filter(col("part") === "p3").count() === 0)
    // v1 still sees p3
    assert(TimeTravel.readVersion(spark, dir, 1)
      .filter(col("part") === "p3").count() === 1)
    // delete every p2 row: p2 gone from v3, present in v1/v2
    TimeTravel.delete(spark, dir, Seq(3L, 4L).toDF("id"), "id", "part")
    assert(TimeTravel.readVersion(spark, dir, 3)
      .filter(col("part") === "p2").count() === 0)
    assert(TimeTravel.readVersion(spark, dir, 2)
      .filter(col("part") === "p2").count() === 2)
  }

  test("no-op delete commits nothing; double init and replayed commits fail") {
    val dir = stage()
    assert(TimeTravel.delete(spark, dir, Seq(99L).toDF("id"),
      "id", "part") === 1)
    assert(TimeTravel.latestVersion(spark, dir) === 1)
    intercept[IllegalArgumentException] {
      TimeTravel.init(spark, dir, Seq((1L, "p1", 1.0)).toDF("id", "part", "v"),
        "part")
    }
    // exclusive create: a manifest for an existing version can't be
    // re-committed (simulate the losing writer directly on the log)
    intercept[java.io.IOException] {
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.create(new org.apache.hadoop.fs.Path(dir, "_graft_log/1.manifest"),
        false).close()
    }
  }

  test("NULL partition values are rejected before any commit") {
    val dir = stage()
    intercept[IllegalArgumentException] {
      TimeTravel.upsert(spark, dir,
        Seq[(java.lang.Long, String, java.lang.Double)]((7L, null, 7.0))
          .toDF("id", "part", "v"), "id", "part")
    }
    assert(TimeTravel.latestVersion(spark, dir) === 1)
    // NULLs refused at CREATION too: such rows could never be touched by
    // the (NULL-rejecting) upsert/delete paths again
    intercept[IllegalArgumentException] {
      TimeTravel.init(spark, tmpDir("tt-null-init"),
        Seq[(java.lang.Long, String, java.lang.Double)]((1L, null, 1.0))
          .toDF("id", "part", "v"), "part")
    }
  }

  test("numeric-looking STRING partition values round-trip (no inference rewrite)") {
    // '01' must NOT be read back as int 1: the manifest matcher works on
    // directory text, and a re-rendered 'part=1' would miss 'part=01/'
    // entries — stale rows would survive a delete
    val dir = tmpDir("tt-numeric-part")
    TimeTravel.init(spark, dir,
      Seq((1L, "01", 1.0), (2L, "01", 2.0), (3L, "2", 3.0))
        .toDF("id", "part", "v"), "part")
    TimeTravel.delete(spark, dir, Seq(1L).toDF("id"), "id", "part")
    val v2 = rows(TimeTravel.readVersion(spark, dir, 2))
    assert(v2 === Set((2L, "01", 2.0), (3L, "2", 3.0)))
    // and an update in the zero-padded partition replaces, not duplicates
    TimeTravel.upsert(spark, dir,
      Seq((2L, "01", 22.0)).toDF("id", "part", "v"), "id", "part")
    assert(rows(TimeTravel.readVersion(spark, dir, 3))
      === Set((2L, "01", 22.0), (3L, "2", 3.0)))
    // a non-string partition column is refused up front
    intercept[IllegalArgumentException] {
      TimeTravel.init(spark, tmpDir("tt-int-part"),
        Seq((1L, 1, 1.0)).toDF("id", "part", "v"), "part")
    }
  }

  test("a commit that would empty the table is refused; the table stays intact") {
    val dir = tmpDir("tt-empty-del")
    TimeTravel.init(spark, dir,
      Seq((1L, "p1", 1.0), (2L, "p2", 2.0)).toDF("id", "part", "v"), "part")
    val ex = intercept[IllegalArgumentException] {
      TimeTravel.delete(spark, dir, Seq(1L, 2L).toDF("id"), "id", "part")
    }
    assert(ex.getMessage.contains("empty the table"))
    // no bricked latest version: v1 still serves and commits still work
    assert(TimeTravel.latestVersion(spark, dir) === 1)
    assert(rows(TimeTravel.readVersion(spark, dir, 1)).size === 2)
    assert(TimeTravel.delete(spark, dir, Seq(1L).toDF("id"),
      "id", "part") === 2)
    // an EMPTY upsert batch is a no-op, not a duplicate commit
    assert(TimeTravel.upsert(spark, dir,
      Seq.empty[(Long, String, Double)].toDF("id", "part", "v"),
      "id", "part") === 2)
  }

  test("vacuum reclaims only files no retained version references") {
    val dir = stage()
    TimeTravel.upsert(spark, dir,
      Seq((1L, "p1", 11.0)).toDF("id", "part", "v"), "id", "part") // v2: p1 rewritten
    TimeTravel.delete(spark, dir, Seq(3L).toDF("id"), "id", "part") // v3: p2 rewritten
    val v2Rows = TimeTravel.readVersion(spark, dir, 2)
      .orderBy("id").collect().toSeq
    val filesBefore = Files.walk(Paths.get(dir, "data")).iterator().asScala
      .count(_.toString.endsWith(".parquet"))
    val (deleted, dropped) = TimeTravel.vacuum(spark, dir, keepFrom = 2)
    assert(dropped === 1) // v1's manifest gone
    assert(deleted > 0)   // v1's p1 files were only referenced by v1
    // retained versions fully intact
    assert(TimeTravel.readVersion(spark, dir, 2)
      .orderBy("id").collect().toSeq === v2Rows)
    assert(TimeTravel.readVersion(spark, dir, 3).count() === 4)
    // v1 now fails LOUDLY, not with silent partial data
    intercept[IllegalArgumentException] {
      TimeTravel.readVersion(spark, dir, 1)
    }
    // disk now holds exactly the union of retained manifests
    val retained = (2 to 3).flatMap(v => Files.readAllLines(
      Paths.get(dir, "_graft_log", s"$v.manifest")).asScala).toSet
    val onDisk = Files.walk(Paths.get(dir, "data")).iterator().asScala
      .filter(_.toString.endsWith(".parquet"))
      .map(p => Paths.get(dir, "data").relativize(p).toString).toSet
    assert(onDisk === retained)
    assert(onDisk.size < filesBefore)
    // vacuuming at the floor that keeps everything is a no-op
    assert(TimeTravel.vacuum(spark, dir, keepFrom = 2) === ((0, 0)))
  }

  test("snapshotDiff across versions from manifests alone matches the applied batches") {
    val dir = stage()
    TimeTravel.upsert(spark, dir,
      Seq((1L, "p1", 11.0), (9L, "p2", 90.0)).toDF("id", "part", "v"),
      "id", "part")
    TimeTravel.delete(spark, dir, Seq(3L).toDF("id"), "id", "part")
    val d = Merge.snapshotDiff(
      TimeTravel.readVersion(spark, dir, 1),
      TimeTravel.readVersion(spark, dir, 3), "id", Seq("part", "v"))
      .collect().head
    assert((d.getAs[Long]("n_added"), d.getAs[Long]("n_removed"),
      d.getAs[Long]("n_changed"), d.getAs[Long]("n_unchanged"))
      === ((1L, 1L, 1L, 3L)))
  }
}
