package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TimeTravel.{MatchedDelete, MatchedUpdate, NotMatchedInsert}

/** Conditional MERGE ([[TimeTravel.merge]]): the full WHEN-clause
  * surface — guarded update/delete/insert, clause-order semantics,
  * unmatched passthrough, refusals, CDC. */
class ConditionalMergeSpec extends SparkSpec {

  import spark.implicits._

  /** Target: keys 1-6 across two partitions, x = 10*k, status cycles
    * A/B/C. */
  private def target(): String = {
    val t = tmpDir("cmerge")
    val df = (1L to 6L).map(k =>
      (k, s"p${k % 2}", k * 10.0, Seq("A", "B", "C")((k % 3).toInt)))
      .toDF("k", "p", "x", "s")
    TimeTravel.init(spark, t, df, "p")
    t
  }
  private def read(t: String) =
    TimeTravel.readVersion(spark, t, TimeTravel.latestVersion(spark, t))

  // target statuses from k % 3: 1→B, 2→C, 3→A, 4→B, 5→C, 6→A

  test("all three clause kinds in one merge, conditions honored, no-clause rows pass through") {
    val t = target()
    // source matches keys 2 (C), 3 (A), 4 (B) and brings new keys 7,8
    val src = Seq(
      (2L, "p0", 999.0, "B"), (3L, "p1", 999.0, "C"),
      (4L, "p0", 999.0, "A"),
      (7L, "p1", 50.0, "N"), (8L, "p0", 500.0, "N"))
      .toDF("k", "p", "x", "s")
    TimeTravel.merge(spark, t, src, "k", "p", Seq(
      // status B targets get the source x
      MatchedUpdate(Some(col("tgt.s") === "B"), Map("x" -> col("src.x"))),
      // status C targets are deleted
      MatchedDelete(Some(col("tgt.s") === "C")),
      // only expensive source rows insert
      NotMatchedInsert(Some(col("x") > 100.0))))
    val rows = read(t).select("k", "x").as[(Long, Double)].collect().toMap
    assert(rows(4L) === 999.0, "B-status match updates")       // clause 1
    assert(!rows.contains(2L), "C-status match deletes")       // clause 2
    assert(rows(3L) === 30.0, "A-status match passes through unchanged")
    assert(!rows.contains(7L), "cheap source row's insert is rejected")
    assert(rows(8L) === 500.0, "expensive source row inserts")
    assert(rows(1L) === 10.0 && rows(5L) === 50.0 && rows(6L) === 60.0,
      "unmatched target rows untouched")
  }

  test("clause order decides: first accepting clause wins") {
    val t = target()
    val src = Seq((2L, "p0", 1.0, "B")).toDF("k", "p", "x", "s")
    // both clauses' conditions hold for key 2 (status C); update FIRST
    TimeTravel.merge(spark, t, src, "k", "p", Seq(
      MatchedUpdate(Some(col("tgt.k") === 2), Map("x" -> lit(777.0))),
      MatchedDelete(Some(col("tgt.s") === "C"))))
    assert(read(t).filter(col("k") === 2).select("x").as[Double]
      .head() === 777.0)
    // same merge with the clauses swapped: the delete wins
    val t2 = target()
    TimeTravel.merge(spark, t2, src, "k", "p", Seq(
      MatchedDelete(Some(col("tgt.s") === "C")),
      MatchedUpdate(Some(col("tgt.k") === 2), Map("x" -> lit(777.0)))))
    assert(read(t2).filter(col("k") === 2).isEmpty)
  }

  test("update-all (empty SET) takes every source column") {
    val t = target()
    val src = Seq((5L, "p1", -5.0, "Z")).toDF("k", "p", "x", "s")
    TimeTravel.merge(spark, t, src, "k", "p", Seq(MatchedUpdate()))
    val r = read(t).filter(col("k") === 5)
      .select("x", "s").as[(Double, String)].head()
    assert(r === ((-5.0, "Z")))
  }

  test("duplicate source keys are refused up front") {
    val t = target()
    val src = Seq((2L, "p0", 1.0, "B"), (2L, "p0", 2.0, "B"))
      .toDF("k", "p", "x", "s")
    val e = intercept[IllegalArgumentException](
      TimeTravel.merge(spark, t, src, "k", "p", Seq(MatchedUpdate())))
    assert(e.getMessage.contains("duplicate keys"))
  }

  test("SET on key or partition column is refused") {
    val t = target()
    val src = Seq((2L, "p0", 1.0, "B")).toDF("k", "p", "x", "s")
    intercept[IllegalArgumentException](TimeTravel.merge(spark, t, src,
      "k", "p", Seq(MatchedUpdate(None, Map("k" -> lit(99L))))))
    intercept[IllegalArgumentException](TimeTravel.merge(spark, t, src,
      "k", "p", Seq(MatchedUpdate(None, Map("p" -> lit("z"))))))
  }

  test("a merge whose clauses accept nothing commits nothing") {
    val t = target()
    val before = TimeTravel.latestVersion(spark, t)
    val src = Seq((99L, "p1", 1.0, "Z")).toDF("k", "p", "x", "s")
    // unmatched source, but the insert clause rejects it
    val v = TimeTravel.merge(spark, t, src, "k", "p", Seq(
      NotMatchedInsert(Some(lit(false)))))
    assert(v === before)
  }

  test("changed rows are re-validated against CHECK constraints") {
    val t = target()
    TimeTravel.addConstraint(spark, t, "x_pos", "x > 0")
    val src = Seq((2L, "p0", -1.0, "B")).toDF("k", "p", "x", "s")
    intercept[IllegalArgumentException](TimeTravel.merge(spark, t, src,
      "k", "p", Seq(MatchedUpdate(None, Map("x" -> col("src.x"))))))
  }

  test("changeFeed captures update pre/post, delete, and insert images") {
    val t = target()
    val src = Seq(
      (4L, "p0", 999.0, "B"), (2L, "p0", 0.0, "C"),
      (8L, "p0", 500.0, "N")).toDF("k", "p", "x", "s")
    val v = TimeTravel.merge(spark, t, src, "k", "p", Seq(
      MatchedUpdate(Some(col("tgt.s") === "B"), Map("x" -> col("src.x"))),
      MatchedDelete(Some(col("tgt.s") === "C")),
      NotMatchedInsert()), changeFeed = true)
    val byType = TimeTravel.readChangesSince(spark, t, v - 1, v)
      .groupBy(TimeTravel.ChangeTypeCol).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType === Map("update_preimage" -> 1L,
      "update_postimage" -> 1L, "delete" -> 1L, "insert" -> 1L))
  }

  test("merge commits refuse the insert-only feed, like every rewrite") {
    val t = target()
    val src = Seq((2L, "p0", 1.0, "B")).toDF("k", "p", "x", "s")
    val v = TimeTravel.merge(spark, t, src, "k", "p",
      Seq(MatchedUpdate()))
    val e = intercept[IllegalArgumentException](
      TimeTravel.readAppendsSince(spark, t, v - 1, v))
    assert(e.getMessage.contains("insert-only"))
  }
}
