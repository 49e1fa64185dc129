package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** MERGE parity frontier ([[TimeTravel.merge]] + [[graft.sql.GraftSql]]):
  * WHEN NOT MATCHED BY SOURCE (update/delete), general ON conditions
  * beyond the key equality, and explicit INSERT column lists — the
  * three refusals round 14 still carried. */
class MergeParitySpec extends SparkSpec {

  import spark.implicits._

  private def stage(): String = {
    val t = tmpDir("mergepar")
    TimeTravel.init(spark, t,
      Seq((1L, "a", 10.0, "keep"), (2L, "a", 20.0, "keep"),
        (3L, "b", 30.0, "keep"), (4L, "b", 40.0, "keep"))
        .toDF("k", "p", "v", "s"), "p")
    t
  }
  private def rows(t: String): Set[(Long, Double, String)] =
    TimeTravel.readVersion(spark, t, TimeTravel.latestVersion(spark, t))
      .select("k", "v", "s").as[(Long, Double, String)].collect().toSet

  test("NOT MATCHED BY SOURCE: target rows outside the source update or delete (the sync-a-dimension shape)") {
    val t = stage()
    // source mentions k=1 (update) and k=9 (insert); k=2 retires via
    // BY SOURCE DELETE (condition), k=3/4 flag via BY SOURCE UPDATE
    val src = Seq((1L, "a", 11.0, "keep"), (9L, "c", 90.0, "new"))
      .toDF("k", "p", "v", "s")
    TimeTravel.merge(spark, t, src, "k", "p", Seq(
      TimeTravel.MatchedUpdate(None, Map("v" -> col("src.v"))),
      TimeTravel.NotMatchedInsert(),
      TimeTravel.NotMatchedBySourceDelete(
        Some(col("tgt.k") === 2L)),
      TimeTravel.NotMatchedBySourceUpdate(None,
        Map("s" -> lit("stale")))))
    assert(rows(t) === Set(
      (1L, 11.0, "keep"),   // matched update
      (3L, 30.0, "stale"),  // by-source update (delete condition missed)
      (4L, 40.0, "stale"),
      (9L, 90.0, "new")))   // insert; k=2 deleted by source absence
  }

  test("general ON condition: a key-equal pair failing the extra conjunct is NOT matched") {
    val t = stage()
    // ON t.k = s.k AND t.v < s.v — k=1 matches (10 < 100), k=2's pair
    // fails (20 > 2): its source row INSERTS under a fresh... no —
    // same key: the insert lands and the table then holds both rows
    // (SQL MERGE semantics: not-matched source rows insert)
    val src = Seq((1L, "a", 100.0, "upd"), (2L, "a", 2.0, "low"))
      .toDF("k", "p", "v", "s")
    TimeTravel.merge(spark, t, src, "k", "p", Seq(
      TimeTravel.MatchedUpdate(None, Map("v" -> col("src.v"),
        "s" -> col("src.s"))),
      TimeTravel.NotMatchedInsert()),
      extraOn = Some(col("tgt.v") < col("src.v")))
    assert(rows(t) === Set(
      (1L, 100.0, "upd"),  // matched: 10 < 100
      (2L, 20.0, "keep"),  // key equal but 20 !< 2 → untouched
      (2L, 2.0, "low"),    // …and the unmatched source row inserted
      (3L, 30.0, "keep"), (4L, 40.0, "keep")))
  }

  test("explicit INSERT column lists: listed columns take expressions, unlisted NULL-fill; partition column must be listed") {
    val t = stage()
    val src = Seq((8L, "c", 80.0, "x")).toDF("k", "p", "v", "s")
    TimeTravel.merge(spark, t, src, "k", "p", Seq(
      TimeTravel.NotMatchedInsert(None, Map(
        "k" -> col("k"), "p" -> col("p"),
        "v" -> (col("v") * 2)))))
    val got = TimeTravel.readVersion(spark, t,
        TimeTravel.latestVersion(spark, t))
      .filter(col("k") === 8L)
      .select("v", "s").as[(Double, Option[String])].collect().toSeq
    assert(got === Seq((160.0, None)),
      "listed expression applied, unlisted column NULL")
    // a list that skips the partition column refuses up front
    val e = intercept[IllegalArgumentException](
      TimeTravel.merge(spark, t, src, "k", "p", Seq(
        TimeTravel.NotMatchedInsert(None, Map("k" -> col("k"))))))
    assert(e.getMessage.contains("partition column"))
  }

  test("SQL MERGE: BY SOURCE + general ON + insert column list through GraftSql.exec") {
    import graft.sql.GraftSql
    val t = stage()
    Seq((1L, "a", 100.0, "upd"), (7L, "b", 70.0, "new"))
      .toDF("k", "p", "v", "s").createOrReplaceTempView("mp_src")
    GraftSql.exec(spark, s"""MERGE INTO graft.`$t` AS t
      USING mp_src AS s
      ON t.k = s.k AND t.v < s.v
      WHEN MATCHED THEN UPDATE SET v = s.v, s = s.s
      WHEN NOT MATCHED THEN INSERT (k, p, v) VALUES (s.k, s.p, s.v + 1)
      WHEN NOT MATCHED BY SOURCE AND t.k = 4 THEN DELETE
      WHEN NOT MATCHED BY SOURCE THEN UPDATE SET s = 'stale'""")
    assert(rows(t).map { case (k, v, s) => (k, v, Option(s)) } === Set(
      (1L, 100.0, Some("upd")),   // matched (10 < 100)
      (2L, 20.0, Some("stale")),  // by-source update
      (3L, 30.0, Some("stale")),
      (7L, 71.0, None)))          // insert list: v+1, s NULL; k=4 deleted
  }

  test("SQL MERGE: composite ON keys drive the match") {
    import graft.sql.GraftSql
    val t = tmpDir("mergepar-ck")
    TimeTravel.init(spark, t,
      Seq((1L, 10L, "a", 1.0), (1L, 20L, "a", 2.0))
        .toDF("k1", "k2", "p", "v"), "p")
    Seq((1L, 10L, "a", 11.0), (2L, 30L, "b", 3.0))
      .toDF("k1", "k2", "p", "v").createOrReplaceTempView("mp_ck_src")
    GraftSql.exec(spark, s"""MERGE INTO graft.`$t` t USING mp_ck_src s
      ON t.k1 = s.k1 AND t.k2 = s.k2
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    val got = TimeTravel.readVersion(spark, t,
        TimeTravel.latestVersion(spark, t))
      .select("k1", "k2", "v").as[(Long, Long, Double)].collect().toSet
    assert(got === Set((1L, 10L, 11.0), (1L, 20L, 2.0), (2L, 30L, 3.0)))
  }

  test("BY SOURCE CDC: retired and flagged rows capture change images") {
    val t = stage()
    val src = Seq((1L, "a", 11.0, "keep")).toDF("k", "p", "v", "s")
    val v = TimeTravel.merge(spark, t, src, "k", "p", Seq(
      TimeTravel.MatchedUpdate(None, Map("v" -> col("src.v"))),
      TimeTravel.NotMatchedBySourceDelete(Some(col("tgt.k") === 2L)),
      TimeTravel.NotMatchedBySourceUpdate(None,
        Map("s" -> lit("stale")))), changeFeed = true)
    val feed = TimeTravel.readChangesSince(spark, t, v - 1, v)
      .select(col("k"), col(TimeTravel.ChangeTypeCol))
      .as[(Long, String)].collect().toSet
    assert(feed === Set(
      (1L, "update_preimage"), (1L, "update_postimage"),
      (2L, "delete"),
      (3L, "update_preimage"), (3L, "update_postimage"),
      (4L, "update_preimage"), (4L, "update_postimage")))
  }
}
