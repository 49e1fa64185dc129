package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TimeTravel

/** The declarative batch read ([[GraftVersionedRelation]]) against the
  * imperative [[TimeTravel]] API it must mirror exactly. */
class DeclarativeReadSpec extends SparkSpec {

  private def stage(): String = {
    val t = tmpDir("decl-read")
    import spark.implicits._
    val v1 = Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0))
      .toDF("k", "p", "x")
    TimeTravel.init(spark, t, v1, "p")
    TimeTravel.append(spark, t,
      Seq((4L, "b", 40.0), (5L, "c", 50.0)).toDF("k", "p", "x"), "p")
    TimeTravel.upsert(spark, t,
      Seq((2L, "a", 99.0)).toDF("k", "p", "x"), "k", "p")
    t
  }

  private def read(t: String, opts: (String, String)*): DataFrame =
    opts.foldLeft(spark.read.format("graft-versioned")
      .option("path", t))((r, kv) => r.option(kv._1, kv._2)).load()

  private def rows(df: DataFrame): Set[(Long, String, Double)] =
    df.select(col("k"), col("p"), col("x")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet

  test("latest / versionAsOf match readVersion exactly") {
    val t = stage()
    for (v <- 1 to 3)
      assert(rows(read(t, "versionAsOf" -> v.toString)) ===
        rows(TimeTravel.readVersion(spark, t, v)), s"version $v")
    assert(rows(read(t)) === rows(TimeTravel.readVersion(spark, t, 3)))
  }

  test("the relation is a frozen snapshot: commits after construction are invisible") {
    val t = stage()
    val tip = read(t)
    val before = rows(tip)
    import spark.implicits._
    TimeTravel.append(spark, t,
      Seq((6L, "c", 60.0)).toDF("k", "p", "x"), "p")
    assert(rows(tip) === before)
    assert(rows(read(t)).size === before.size + 1)
  }

  test("timestampAsOf resolves each commit's recorded wall-clock") {
    val t = stage()
    val hist = TimeTravel.history(spark, t)
    for (v <- 1 to 3) {
      val ts = hist.find(_.version == v).get.timestampMs.get
      assert(rows(read(t, "timestampAsOf" -> ts.toString)) ===
        rows(TimeTravel.readVersion(spark,
          t, TimeTravel.versionAsOf(spark, t, ts))), s"ts of v$v")
    }
  }

  test("versionAsOf and timestampAsOf together are refused") {
    val t = stage()
    val e = intercept[IllegalArgumentException](
      read(t, "versionAsOf" -> "1", "timestampAsOf" -> "0"))
    assert(e.getMessage.contains("mutually exclusive"))
  }

  test("schema time travel: a pre-evolution version reads its own columns") {
    val t = tmpDir("decl-evolve")
    import spark.implicits._
    TimeTravel.init(spark, t, Seq((1L, "a")).toDF("k", "p"), "p")
    TimeTravel.append(spark, t,
      Seq((2L, "b", "new")).toDF("k", "p", "extra"), "p",
      evolveSchema = true)
    val v1 = read(t, "versionAsOf" -> "1")
    assert(!v1.columns.contains("extra"))
    // tip: the pre-evolution file NULL-fills the added column
    val tip = read(t).select(col("k"), col("extra")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(tip === Map(1L -> None, 2L -> Some("new")))
  }

  test("pushed range filter prunes files via log stats before split planning") {
    val t = tmpDir("decl-skip")
    import spark.implicits._
    // four disjoint key slabs in one partition dir: only stats can prune
    (0 until 4).foreach { s =>
      val df = ((s * 100) until (s * 100 + 100)).map(i =>
        (i.toLong, "p0", i * 1.0)).toDF("k", "p", "x")
      if (s == 0) TimeTravel.init(spark, t, df.repartition(1), "p")
      else TimeTravel.append(spark, t, df.repartition(1), "p")
    }
    val filtered = read(t).filter(col("k") >= 110 && col("k") <= 150)
    val scan = filtered.queryExecution.sparkPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.get
    val sel = scan.relation.location
      .listFiles(scan.partitionFilters, scan.dataFilters)
      .map(_.files.length).sum
    assert(scan.relation.location.inputFiles.length === 4)
    assert(sel === 1, "exactly the matching slab's file should survive")
    assert(filtered.count() === 41)
  }

  test("partition predicates prune directories exactly, any shape") {
    val t = stage()
    val filtered = read(t).filter(col("p").isin("a", "c"))
    val scan = filtered.queryExecution.sparkPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.get
    val dirs = scan.relation.location
      .listFiles(scan.partitionFilters, scan.dataFilters)
    assert(dirs.nonEmpty)
    // every surviving partition dir is a or c — b was pruned
    val vals = dirs.map(_.values.getUTF8String(0).toString).toSet
    assert(vals === Set("a", "c"))
    assert(filtered.count() === 3) // tip: (1,a) (2,a) (5,c)
  }

  test("SQL surface: CREATE TEMPORARY VIEW USING graft-versioned, with time travel") {
    val t = stage()
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW decl_vt
      USING `graft-versioned` OPTIONS (path '$t')""")
    assert(spark.sql("SELECT COUNT(*) AS n FROM decl_vt")
      .head.getLong(0) === 5)
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW decl_vt_v1
      USING `graft-versioned` OPTIONS (path '$t', versionAsOf '1')""")
    assert(spark.sql(
        "SELECT CAST(SUM(k) AS BIGINT) AS sk FROM decl_vt_v1")
      .head.getLong(0) === 6) // keys 1+2+3 of v1
    spark.catalog.dropTempView("decl_vt")
    spark.catalog.dropTempView("decl_vt_v1")
  }

  test("superseded files are invisible: upsert'd version reads post-image only") {
    val t = stage()
    val tip = rows(read(t))
    assert(tip.contains((2L, "a", 99.0)) && !tip.contains((2L, "a", 20.0)))
    val v2 = rows(read(t, "versionAsOf" -> "2"))
    assert(v2.contains((2L, "a", 20.0)) && !v2.contains((2L, "a", 99.0)))
  }
}
