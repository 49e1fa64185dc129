package graft.sql

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TimeTravel

/** SQL DML router ([[GraftSql]]): INSERT / INSERT OVERWRITE / DELETE /
  * UPDATE / MERGE strings, parsed by Spark's own parser, landing
  * through the [[TimeTravel]] mutation API — with `graft.`path``
  * addressing, alias handling, merge-on-read routing, and loud
  * refusals for the unsupported corners. */
class GraftSqlSpec extends SparkSpec {

  import spark.implicits._

  private def stage(): String = {
    val t = tmpDir("sqldml")
    TimeTravel.init(spark, t,
      (1 to 40).map(i => (i.toLong, s"p${i % 2}", i * 1.0))
        .toDF("k", "p", "x").repartition(1), "p")
    t
  }

  private def readTip(t: String) =
    TimeTravel.readVersion(spark, t, TimeTravel.latestVersion(spark, t))

  test("INSERT INTO appends; INSERT OVERWRITE replaces; old versions intact") {
    val t = stage()
    Seq((100L, "p0", 1.5), (101L, "p1", 2.5)).toDF("k", "p", "x")
      .createOrReplaceTempView("ins_src")
    GraftSql.exec(spark, s"INSERT INTO graft.`$t` SELECT * FROM ins_src")
    assert(readTip(t).count() === 42)
    // a column list maps query output POSITIONALLY onto the named cols
    GraftSql.exec(spark,
      s"INSERT INTO graft.`$t` (x, k, p) SELECT 9.9, 200L, 'p0'")
    assert(readTip(t).filter(col("k") === 200L).select("x")
      .as[Double].head() === 9.9)
    GraftSql.exec(spark,
      s"INSERT OVERWRITE graft.`$t` SELECT 1L AS k, 'p0' AS p, 0.5 AS x")
    assert(readTip(t).count() === 1)
    assert(TimeTravel.readVersion(spark, t, 1).count() === 40)
  }

  test("DELETE FROM with WHERE, plain and merge-on-read") {
    val t = stage()
    val files0 = TimeTravel.filesAt(spark, t, 1).toSet
    GraftSql.exec(spark, s"DELETE FROM graft.`$t` WHERE k % 10 = 0")
    assert(readTip(t).count() === 36)
    // merge-on-read: zero data files rewritten
    val pre = TimeTravel.filesAt(spark, t,
      TimeTravel.latestVersion(spark, t)).toSet
    GraftSql.exec(spark, s"DELETE FROM graft.`$t` t WHERE t.k = 7",
      mergeOnRead = true)
    assert(readTip(t).count() === 35)
    assert(TimeTravel.filesAt(spark, t,
      TimeTravel.latestVersion(spark, t)).toSet === pre)
    assert(files0.nonEmpty)
  }

  test("UPDATE SET evaluates on original values; alias strips") {
    val t = stage()
    GraftSql.exec(spark,
      s"UPDATE graft.`$t` AS g SET x = g.x + 100 WHERE g.k <= 2")
    val out = readTip(t).filter(col("k") <= 2).select("k", "x")
      .as[(Long, Double)].collect().toMap
    assert(out === Map(1L -> 101.0, 2L -> 102.0))
    // merge-on-read update: only new image files added
    val pre = TimeTravel.filesAt(spark, t,
      TimeTravel.latestVersion(spark, t)).toSet
    GraftSql.exec(spark, s"UPDATE graft.`$t` SET x = 0.0 WHERE k = 3",
      mergeOnRead = true)
    val post = TimeTravel.filesAt(spark, t,
      TimeTravel.latestVersion(spark, t)).toSet
    assert((pre -- post).isEmpty, "MOR update must rewrite no file")
    assert(readTip(t).filter(col("k") === 3).select("x")
      .as[Double].head() === 0.0)
  }

  test("MERGE INTO: ordered conditional clauses, star update, star insert") {
    val t = stage()
    Seq((1L, "p1", 1000.0, true), (2L, "p0", 2000.0, false),
      (999L, "p1", 9.0, false))
      .toDF("k", "p", "x", "del").createOrReplaceTempView("merge_src")
    val v = GraftSql.exec(spark,
      s"""MERGE INTO graft.`$t` tg USING (SELECT k, p, x FROM merge_src) s
         ON tg.k = s.k
         WHEN MATCHED AND tg.k = 1 THEN DELETE
         WHEN MATCHED THEN UPDATE SET x = s.x + 0.5
         WHEN NOT MATCHED THEN INSERT *""")
    val tip = TimeTravel.readVersion(spark, t, v)
    assert(tip.filter(col("k") === 1L).count() === 0) // first clause won
    assert(tip.filter(col("k") === 2L).select("x")
      .as[Double].head() === 2000.5)
    assert(tip.filter(col("k") === 999L).count() === 1)
    assert(tip.count() === 40) // 40 - 1 deleted + 1 inserted
  }

  test("GraftSql.sql: path-addressed SELECT with VERSION/TIMESTAMP AS OF time travel") {
    val t = stage() // v1: 40 rows
    TimeTravel.append(spark, t,
      Seq((100L, "p0", 1.0), (101L, "p1", 2.0)).toDF("k", "p", "x"), "p")
    // tip read, no view registration
    assert(GraftSql.sql(spark,
      s"SELECT count(*) AS n FROM graft.`$t`").head.getLong(0) === 42)
    // VERSION AS OF reads the pre-append snapshot
    assert(GraftSql.sql(spark,
      s"SELECT count(*) AS n FROM graft.`$t` VERSION AS OF 1")
      .head.getLong(0) === 40)
    // TIMESTAMP AS OF at v1's recorded wall-clock
    val ts1 = TimeTravel.history(spark, t)
      .find(_.version == 1).flatMap(_.timestampMs).get
    assert(GraftSql.sql(spark,
      s"SELECT count(*) AS n FROM graft.`$t` TIMESTAMP AS OF $ts1")
      .head.getLong(0) === 40)
    // predicates, projections, and joins against ordinary views compose
    Seq((1L, "one"), (2L, "two")).toDF("k", "name")
      .createOrReplaceTempView("sql_names")
    val joined = GraftSql.sql(spark,
      s"""SELECT g.k, n.name FROM graft.`$t` g
         JOIN sql_names n ON g.k = n.k WHERE g.x < 10 ORDER BY g.k""")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(joined === Seq((1L, "one"), (2L, "two")))
    // merge-on-read versions read through the same surface
    TimeTravel.deleteWhereDv(spark, t, col("k") === 100L, "p")
    assert(GraftSql.sql(spark,
      s"SELECT count(*) AS n FROM graft.`$t`").head.getLong(0) === 41)
  }

  test("INSERT INTO ... SELECT FROM graft.`b`: the cross-table SQL copy") {
    val a = stage()
    val b = tmpDir("sqldml-b")
    TimeTravel.init(spark, b,
      Seq((500L, "p0", 5.5), (501L, "p1", 6.5)).toDF("k", "p", "x"), "p")
    GraftSql.exec(spark,
      s"INSERT INTO graft.`$a` SELECT * FROM graft.`$b` WHERE k = 500")
    assert(readTip(a).filter(col("k") === 500L).count() === 1)
    assert(readTip(a).count() === 41)
  }

  test("refusals name the unsupported piece") {
    val t = stage()
    val e1 = intercept[IllegalArgumentException](GraftSql.exec(spark,
      s"DELETE FROM sometable WHERE k = 1"))
    assert(e1.getMessage.contains("graft.`/abs/path`"))
    // a composite equality ON is SUPPORTED now (round-15 merge
    // parity); only an ON with no key-equality conjunct refuses
    val e2 = intercept[IllegalArgumentException](GraftSql.exec(spark,
      s"""MERGE INTO graft.`$t` t USING (SELECT 1L k, 'p0' p, 1.0 x) s
         ON t.x < s.x
         WHEN MATCHED THEN DELETE"""))
    assert(e2.getMessage.contains("key equality"))
    val e3 = intercept[IllegalArgumentException](GraftSql.exec(spark,
      s"SELECT * FROM graft.`$t`"))
    assert(e3.getMessage.contains("not a DML statement"))
    val e4 = intercept[IllegalArgumentException](GraftSql.exec(spark,
      s"INSERT INTO graft.`$t` PARTITION (p='p0') SELECT 1L, 1.0"))
    assert(e4.getMessage.contains("static-partition"))
  }
}
