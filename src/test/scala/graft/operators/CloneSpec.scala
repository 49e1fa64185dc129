package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Zero-copy CLONE ([[TimeTravel.cloneAt]]) and DESCRIBE DETAIL
  * ([[TimeTravel.detail]]): a clone forks a version via hard links —
  * no data copied, both tables fully independent afterwards (unlike a
  * path-referencing shallow clone, a source vacuum cannot break it) —
  * carrying stats, DV/bloom bindings, schema, and policies verbatim. */
class CloneSpec extends SparkSpec {

  import spark.implicits._

  private def stage(): String = {
    val t = tmpDir("clone-src")
    TimeTravel.init(spark, t, (0 until 100).map(i =>
      (i.toLong, s"p${i % 2}", i * 1.0)).toDF("k", "p", "x")
      .repartition(1), "p")
    TimeTravel.append(spark, t, (100 until 120).map(i =>
      (i.toLong, s"p${i % 2}", i * 1.0)).toDF("k", "p", "x")
      .repartition(1), "p")
    t
  }

  private def keys(t: String): Set[Long] =
    TimeTravel.readVersion(spark, t, TimeTravel.latestVersion(spark, t))
      .select("k").as[Long].collect().toSet

  test("a clone reproduces the source version exactly, with zero data bytes written") {
    val src = stage()
    val dst = tmpDir("clone-dst")
    assert(TimeTravel.cloneAt(spark, src, dst) === 1)
    assert(keys(dst) === (0L until 120L).toSet)
    // hard links: same inode content, no copy — file sets match by name
    assert(TimeTravel.filesAt(spark, dst, 1).toSet ===
      TimeTravel.filesAt(spark, src, 2).toSet)
    // cloning AS OF an earlier version forks that version
    val dst1 = tmpDir("clone-dst1")
    TimeTravel.cloneAt(spark, src, dst1, version = 1)
    assert(keys(dst1) === (0L until 100L).toSet)
    // a non-fresh destination is refused
    intercept[IllegalArgumentException](
      TimeTravel.cloneAt(spark, src, dst))
  }

  test("clone and source evolve independently; a source vacuum cannot break the clone") {
    val src = stage()
    val dst = tmpDir("clone-ind")
    TimeTravel.cloneAt(spark, src, dst)
    TimeTravel.append(spark, dst,
      Seq((999L, "p1", 9.0)).toDF("k", "p", "x"), "p")
    assert(keys(dst) === (0L until 120L).toSet + 999L)
    assert(keys(src) === (0L until 120L).toSet, "source untouched")
    // rewrite the source whole, then vacuum it to the tip: the clone's
    // linked bytes survive because links share inodes, not paths
    val vc = TimeTravel.compact(spark, src, "p", maxFilesPerDir = 1)
    TimeTravel.vacuum(spark, src, keepFrom = vc, orphanMinAgeMs = 0L)
    assert(keys(dst) === (0L until 120L).toSet + 999L,
      "a source vacuum must never break a clone")
  }

  test("a clone carries DV bindings, bloom bindings, and policies verbatim") {
    val src = tmpDir("clone-rich")
    TimeTravel.init(spark, src, (0 until 50).map(i =>
      (i.toLong, "a", i * 1.0)).toDF("k", "p", "x").repartition(1), "p")
    TimeTravel.setBloomIndex(spark, src, "k", 1000L, 0.001)
    TimeTravel.addConstraint(spark, src, "nonneg", "x >= 0")
    TimeTravel.append(spark, src, (50 until 100).map(i =>
      (i.toLong, "a", i * 1.0)).toDF("k", "p", "x").repartition(1), "p")
    TimeTravel.deleteWhereDv(spark, src, col("k") === 7L, "p")
    val dst = tmpDir("clone-rich-dst")
    TimeTravel.cloneAt(spark, src, dst)
    // DV applied through the clone's own binding
    assert(keys(dst) === (0L until 100L).toSet - 7L)
    // bloom binding carried: a point probe prunes the indexed file
    val scan = TimeTravel.readVersionSkipping(spark, dst, 1, "k", 75L, 75L)
    assert(scan.filesRead < scan.filesTotal)
    // policies carried: the constraint refuses on the CLONE, and new
    // appends to the clone build bloom filters under the carried index
    intercept[IllegalArgumentException](TimeTravel.append(spark, dst,
      Seq((200L, "a", -1.0)).toDF("k", "p", "x"), "p"))
    val d = TimeTravel.detail(spark, dst)
    assert(d.version === 1 && d.partitionColumn === "p")
    assert(d.constraints.keySet === Set("nonneg"))
    assert(d.bloomIndex.keySet === Set("k"))
    assert(d.dvBoundFiles === 1 && d.bloomBoundFiles >= 1)
    assert(d.numFiles === TimeTravel.filesAt(spark, dst, 1).size)
    assert(d.sizeBytes > 0)
  }

  test("clone refuses a vacuumed-away source version cleanly — no half-created destination") {
    val src = stage()
    TimeTravel.compact(spark, src, "p") // v3: checkpointable floor
    TimeTravel.vacuum(spark, src, keepFrom = 3)
    val dst = tmpDir("clone-vacuumed")
    val e = intercept[IllegalArgumentException](
      TimeTravel.cloneAt(spark, src, dst, version = 1))
    assert(e.getMessage.contains("not resolvable"),
      s"expected the resolution refusal, got: ${e.getMessage}")
    // the refusal fired BEFORE anything landed: the destination has no
    // commits and a retry against a live version succeeds cleanly
    assert(TimeTravel.latestVersion(spark, dst) === 0)
    assert(TimeTravel.cloneAt(spark, src, dst, version = 3) === 1)
    assert(keys(dst) === (0L until 120L).toSet)
  }

  test("a source file vanishing mid-clone (a concurrent vacuum's crash window) cannot produce a half-linked clone") {
    val src = stage()
    // simulate the race: the clone resolved its snapshot, then a
    // concurrent source vacuum reclaimed one of the files before the
    // link pass reached it
    val victim = TimeTravel.filesAt(spark, src, 2).head
    assert(new java.io.File(s"$src/data/$victim").delete())
    val dst = tmpDir("clone-race")
    intercept[Exception](TimeTravel.cloneAt(spark, src, dst))
    // the clone's manifest lands AFTER the link pass, so the failed
    // clone is INVISIBLE — no commit, no readable half-state; the
    // leftover linked files are orphans a dst-side cleanup can sweep
    assert(TimeTravel.latestVersion(spark, dst) === 0)
    intercept[Exception](TimeTravel.readVersion(spark, dst, 1))
  }
}
