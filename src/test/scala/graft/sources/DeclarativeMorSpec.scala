package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TimeTravel

/** Merge-on-read declarative relation
  * ([[GraftVersionedMorRelation]]): `spark.read.format(
  * "graft-versioned")` keeps working on DV-bound and column-mapped
  * versions — the two snapshot states the raw-split HadoopFsRelation
  * cannot represent — with readVersion-identical results, pushed
  * filters, and per-version schema time travel. */
class DeclarativeMorSpec extends SparkSpec {

  import spark.implicits._

  private def read(t: String, opts: (String, String)*) =
    opts.foldLeft(spark.read.format("graft-versioned")
      .option("path", t))((r, kv) => r.option(kv._1, kv._2)).load()

  private def dvTable(): (String, Int) = {
    val t = tmpDir("mor-dv")
    val df = (1 to 400).map(i => (i.toLong, s"p${i % 4}", i * 1.0))
      .toDF("k", "p", "x").repartition(2)
    TimeTravel.init(spark, t, df, "p")
    val v = TimeTravel.deleteWhereDv(spark, t,
      col("k") % 10 === 0, "p")
    (t, v)
  }

  test("a DV-bound version reads declaratively: deleted rows stay deleted") {
    val (t, v) = dvTable()
    val decl = read(t)
    assert(decl.count() === 360) // NOT 400: no resurrection
    assert(decl.filter(col("k") % 10 === 0).count() === 0)
    // row-identical to the imperative read
    val imp = TimeTravel.readVersion(spark, t, v)
    assert(decl.select("k", "p", "x").except(imp.select("k", "p", "x"))
      .isEmpty)
    assert(imp.select("k", "p", "x").except(decl.select("k", "p", "x"))
      .isEmpty)
    // versionAsOf the PRE-delete version routes to the codegen fast
    // path (no DVs there) and still sees all rows
    assert(read(t, "versionAsOf" -> "1").count() === 400)
  }

  test("pushed filters reach the MOR scan and results stay exact") {
    val (t, _) = dvTable()
    val filtered = read(t).filter(col("k") > 100L && col("p") === "p1")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("GraftVersionedMorRelation"))
    assert(plan.contains("PushedFilters"))
    assert(filtered.count() ===
      (101 to 400).count(i => i % 4 == 1 && i % 10 != 0))
    // COUNT(*) (empty projection) keeps cardinality through the DV join
    assert(read(t).selectExpr("count(*)").head.getLong(0) === 360)
  }

  test("a column-mapped version reads declaratively under logical names") {
    val t = tmpDir("mor-colmap")
    val df = (1 to 100).map(i => (i.toLong, s"p${i % 2}", i * 1.0))
      .toDF("k", "p", "x").repartition(1)
    TimeTravel.init(spark, t, df, "p")
    TimeTravel.renameColumn(spark, t, "x", "value")
    TimeTravel.append(spark, t,
      Seq((1000L, "p0", 7.5)).toDF("k", "p", "value"), "p")
    val decl = read(t)
    assert(decl.columns.toSet === Set("k", "p", "value"))
    assert(decl.filter(col("k") === 50L).select("value")
      .head.getDouble(0) === 50.0) // physical bytes, logical name
    assert(decl.count() === 101)
    // schema TIME TRAVEL: v1 still answers under its own (old) names
    val v1 = read(t, "versionAsOf" -> "1")
    assert(v1.columns.toSet === Set("k", "p", "x"))
    assert(v1.count() === 100)
  }

  test("DV + column mapping compose in one declarative read") {
    val t = tmpDir("mor-both")
    val df = (1 to 200).map(i => (i.toLong, s"p${i % 2}", i * 1.0))
      .toDF("k", "p", "x").repartition(1)
    TimeTravel.init(spark, t, df, "p")
    TimeTravel.renameColumn(spark, t, "x", "value")
    TimeTravel.deleteWhereDv(spark, t, col("value") <= 20.0, "p")
    val decl = read(t)
    assert(decl.columns.toSet === Set("k", "p", "value"))
    assert(decl.count() === 180)
    assert(decl.agg(min(col("value"))).head.getDouble(0) === 21.0)
  }

  test("a pushed range that prunes every file still types an exact empty result") {
    val (t, _) = dvTable()
    val none = read(t).filter(col("k") > 100000L)
    assert(none.count() === 0)
    assert(none.columns.toSet === Set("k", "p", "x"))
  }

  test("MorScanRewrite splices the native codegen plan under the tuned flag; identical results") {
    val (t, v) = dvTable()
    graft.GraftSession.installOptimizations(spark)
    spark.conf.set("spark.graft.mor.rewrite", "true")
    try {
      val decl = read(t).filter(col("k") > 100L && col("p") === "p1")
      val plan = decl.queryExecution.executedPlan.toString
      // the V1 Row seam is GONE: the scan is native parquet with the
      // query's own filters pushed through the DV anti-join
      assert(!plan.contains("GraftVersionedMorRelation"),
        s"relation not spliced:\n$plan")
      assert(plan.contains("FileScan parquet") ||
        plan.contains("Scan parquet"), s"no native scan in:\n$plan")
      assert("PushedFilters: \\[[^\\]]*GreaterThan".r
        .findFirstIn(plan).isDefined,
        s"query filter not pushed to the parquet reader:\n$plan")
      assert(decl.count() ===
        (101 to 400).count(i => i % 4 == 1 && i % 10 != 0))
      // whole-table read and row identity vs the imperative read
      val all = read(t)
      assert(all.count() === 360)
      assert(all.select("k", "p", "x")
        .except(graft.operators.TimeTravel.readVersion(spark, t, v)
          .select("k", "p", "x")).isEmpty)
      // colmap + DV composition through the splice
      val t2 = tmpDir("mor-rule-both")
      val df2 = (1 to 50).map(i => (i.toLong, s"p${i % 2}", i * 1.0))
        .toDF("k", "p", "x").repartition(1)
      graft.operators.TimeTravel.init(spark, t2, df2, "p")
      graft.operators.TimeTravel.renameColumn(spark, t2, "x", "value")
      graft.operators.TimeTravel.deleteWhereDv(spark, t2,
        col("value") <= 10.0, "p")
      val both = read(t2)
      assert(both.columns.toSet === Set("k", "p", "value"))
      assert(both.count() === 40)
      assert(!both.queryExecution.executedPlan.toString
        .contains("GraftVersionedMorRelation"))
    } finally spark.conf.set("spark.graft.mor.rewrite", "false")
  }

  test("the splice PRUNES COLUMNS: a narrow aggregate over a DV-bound version reads only the needed columns") {
    val (t, _) = dvTable()
    graft.GraftSession.installOptimizations(spark)
    spark.conf.set("spark.graft.mor.rewrite", "true")
    // every parquet ReadSchema in the executed plan (AQE prints the
    // whole tree; collect() would not descend into it)
    def readSchemas(df: org.apache.spark.sql.DataFrame): Seq[String] =
      "ReadSchema: struct<[^>]*>".r
        .findAllIn(df.queryExecution.executedPlan.toString).toSeq
    def readsX(s: String): Boolean = "[<,]x:".r.findFirstIn(s).isDefined
    try {
      // one data column out of (k, p, x): the parquet ReadSchema must
      // not carry x — the rule runs after Spark's ColumnPruning, so the
      // projection has to thread INTO the spliced subplan
      val narrow = read(t).filter(col("p") === "p1")
        .groupBy(col("p")).agg(sum(col("k")).as("s"))
      val schemas = readSchemas(narrow)
      assert(schemas.nonEmpty, "no native scan — splice did not fire")
      assert(schemas.forall(!readsX(_)),
        s"unreferenced column 'x' still read: $schemas")
      assert(narrow.collect().map(r => (r.getString(0), r.getLong(1)))
        .toSet === Set("p1" ->
          (1 to 400).filter(i => i % 4 == 1 && i % 10 != 0).map(_.toLong).sum))
      // bare narrow projection (no filter) prunes too
      val proj = read(t).select(col("k"))
      val projSchemas = readSchemas(proj)
      assert(projSchemas.nonEmpty)
      assert(projSchemas.forall(!readsX(_)),
        s"projection-only reads must not scan unreferenced data " +
          s"columns: $projSchemas")
      assert(proj.count() === 360)
    } finally spark.conf.set("spark.graft.mor.rewrite", "false")
  }

  test("the V1 slow-path warning fires exactly once per JVM and only without the rewrite rule") {
    val (t, _) = dvTable()
    GraftVersionedMorRelation.slowPathWarned.set(false)
    val before = GraftVersionedMorRelation.slowPathWarnings.get()
    spark.conf.set("spark.graft.mor.rewrite", "false")
    read(t).count() // V1 fallback: warns once
    read(t).count() // second scan: latched, no second warning
    assert(GraftVersionedMorRelation.slowPathWarnings.get() === before + 1)
  }
}
