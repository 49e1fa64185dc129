package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Predicate DELETE/UPDATE ([[TimeTravel.deleteWhere]] /
  * [[TimeTravel.updateWhere]]): prune/probe/rewrite scope, SQL NULL
  * semantics, CDC images, constraint enforcement, and refusals. */
class RewriteWhereSpec extends SparkSpec {

  import spark.implicits._

  /** Four disjoint key slabs, one file each, across two partitions —
    * slab s holds keys [s*100, s*100+99], part = "p" + (s % 2). */
  private def slabTable(): String = {
    val t = tmpDir("rw-slabs")
    (0 until 4).foreach { s =>
      val df = ((s * 100) until (s * 100 + 100)).map(i =>
        (i.toLong, s"p${s % 2}", i * 1.0)).toDF("k", "p", "x")
        .repartition(1)
      if (s == 0) TimeTravel.init(spark, t, df, "p")
      else TimeTravel.append(spark, t, df, "p")
    }
    t
  }

  test("deleteWhere removes exactly the matching rows and rewrites only files with matches") {
    val t = slabTable()
    val before = TimeTravel.filesAt(spark, t,
      TimeTravel.latestVersion(spark, t)).toSet
    val v = TimeTravel.deleteWhere(spark, t,
      col("k") >= 150 && col("k") < 250, "p")
    val after = TimeTravel.filesAt(spark, t, v).toSet
    // slab 1 (100-199) and slab 2 (200-299) were hit; slabs 0 and 3
    // carry over BY NAME — their files are bit-identical, not rewritten
    assert((before & after).size === 2, "untouched files must carry over")
    val (probed, total) = TimeTravel.discoveryStats(t)
    assert(total === 4 && probed <= 2,
      s"stats pruning should probe at most the 2 intersecting slabs, " +
        s"probed $probed of $total")
    val kept = TimeTravel.readVersion(spark, t, v)
      .select("k").as[Long].collect().toSet
    assert(kept === ((0L until 150L) ++ (250L until 400L)).toSet)
    // the pre-delete version still reads every row
    assert(TimeTravel.readVersion(spark, t, v - 1).count() === 400)
  }

  test("rows where the predicate is NULL survive a deleteWhere") {
    val t = tmpDir("rw-null")
    val df = Seq((1L, "a", Some(1.0)), (2L, "a", None),
      (3L, "a", Some(9.0))).toDF("k", "p", "x")
    TimeTravel.init(spark, t, df, "p")
    val v = TimeTravel.deleteWhere(spark, t, col("x") > 5.0, "p")
    assert(TimeTravel.readVersion(spark, t, v)
      .select("k").as[Long].collect().toSet === Set(1L, 2L))
  }

  test("a predicate matching nothing commits nothing") {
    val t = slabTable()
    val before = TimeTravel.latestVersion(spark, t)
    assert(TimeTravel.deleteWhere(spark, t, col("k") > 9999, "p")
      === before)
    assert(TimeTravel.updateWhere(spark, t, col("k") > 9999,
      Map("x" -> lit(0.0)), "p") === before)
  }

  test("deleting every row is refused before any record lands") {
    val t = slabTable()
    val before = TimeTravel.latestVersion(spark, t)
    val e = intercept[IllegalArgumentException](
      TimeTravel.deleteWhere(spark, t, col("k") >= 0, "p"))
    assert(e.getMessage.contains("empty the table"))
    assert(TimeTravel.latestVersion(spark, t) === before)
  }

  test("updateWhere rewrites matching rows through SET, leaves the rest byte-identical") {
    val t = slabTable()
    val v = TimeTravel.updateWhere(spark, t,
      col("k") >= 100 && col("k") < 200,
      Map("x" -> (col("x") + 1000.0)), "p")
    val rows = TimeTravel.readVersion(spark, t, v)
      .select("k", "x").as[(Long, Double)].collect().toMap
    assert(rows(150L) === 1150.0 && rows(50L) === 50.0 &&
      rows(250L) === 250.0)
    assert(rows.size === 400, "update must not change the row count")
    // a SET that moves the predicate column still updates every match
    val v2 = TimeTravel.updateWhere(spark, t, col("x") >= 1000.0,
      Map("x" -> (col("x") - 1000.0)), "p")
    val back = TimeTravel.readVersion(spark, t, v2)
      .select("k", "x").as[(Long, Double)].collect().toMap
    assert((0L until 400L).forall(k => back(k) === k.toDouble))
  }

  test("SET on the partition column is refused") {
    val t = slabTable()
    val e = intercept[IllegalArgumentException](
      TimeTravel.updateWhere(spark, t, col("k") === 1,
        Map("p" -> lit("z")), "p"))
    assert(e.getMessage.contains("partition column"))
  }

  test("updated rows are re-validated against active CHECK constraints") {
    val t = slabTable()
    TimeTravel.addConstraint(spark, t, "x_nonneg", "x >= 0")
    intercept[IllegalArgumentException](
      TimeTravel.updateWhere(spark, t, col("k") === 5,
        Map("x" -> lit(-1.0)), "p"))
    // the refusal left no commit behind
    val rows = TimeTravel.readVersion(spark, t,
      TimeTravel.latestVersion(spark, t))
      .filter(col("k") === 5).select("x").as[Double].collect()
    assert(rows.toSeq === Seq(5.0))
  }

  test("changeFeed captures delete and update pre/post images") {
    val t = slabTable()
    val v1 = TimeTravel.deleteWhere(spark, t,
      col("k") >= 390, "p", changeFeed = true)
    val v2 = TimeTravel.updateWhere(spark, t, col("k") < 3,
      Map("x" -> lit(-7.0).cast("double")), "p", changeFeed = true)
    // wait: x >= 0 not constrained here; -7 fine
    val feed = TimeTravel.readChangesSince(spark, t, v1 - 1, v2)
    val byType = feed.groupBy(TimeTravel.ChangeTypeCol).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType === Map("delete" -> 10L, "update_preimage" -> 3L,
      "update_postimage" -> 3L))
    val post = feed.filter(col(TimeTravel.ChangeTypeCol)
        === "update_postimage")
      .select("x").as[Double].collect().toSet
    assert(post === Set(-7.0))
  }

  test("predicate rewrites without changeFeed refuse feed windows, like key deletes") {
    val t = slabTable()
    val v = TimeTravel.deleteWhere(spark, t, col("k") === 7, "p")
    val e = intercept[IllegalArgumentException](
      TimeTravel.readAppendsSince(spark, t, v - 1, v))
    assert(e.getMessage.contains("insert-only"))
  }

  test("restore and time travel ride through predicate rewrites") {
    val t = slabTable()
    val v0 = TimeTravel.latestVersion(spark, t)
    TimeTravel.deleteWhere(spark, t, col("k") % 2 === 0, "p")
    val vRestored = TimeTravel.restore(spark, t, v0)
    assert(TimeTravel.readVersion(spark, t, vRestored).count() === 400)
  }
}
