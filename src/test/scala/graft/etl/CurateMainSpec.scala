package graft.etl

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.Dedup

/** End-to-end curation pipeline: quality → exact dedup → near-dup
  * collapse → split, with the invariants each stage must establish. */
class CurateMainSpec extends SparkSpec {

  test("curate: stages only shrink, canonicals are near-dup-free, splits partition the output") {
    val dir = tmpDir("graft-curate")
    val docs = Tables.load(spark, sf, "documents")
    val r = CurateMain.run(spark, docs, dir)

    // monotone: each stage can only remove documents
    assert(r.input >= r.afterQuality)
    assert(r.afterQuality >= r.afterExact)
    assert(r.afterExact >= r.afterNearDup)
    assert(r.afterNearDup > 0)

    val out = spark.read.parquet(r.outputPath)
    // doc_ids unique; split column materialized as a partition
    assert(out.select("doc_id").distinct().count() === r.afterNearDup)
    assert(out.select("split").distinct().collect().map(_.getString(0)).toSet
      .subsetOf(Set("train", "val", "test")))
    assert(new java.io.File(s"${r.outputPath}/split=train").exists())

    // the defining invariant of cluster collapse: no near-dup pair can
    // survive among the canonical documents (a >=-threshold pair would
    // have been in one component, which keeps a single representative)
    assert(Dedup.jaccardPairsPrefix(out, 0.5).count() === 0)

    // stats sidecar written with the final row count
    val stats = new ObjectMapper().readTree(
      new java.io.File(s"$dir/curate-stats.json"))
    assert(stats.get("total_rows").asLong() === r.afterNearDup)
  }

  test("curate: star clustering yields the identical canonical set") {
    val dir = tmpDir("graft-curate-star")
    val docs = Tables.load(spark, sf, "documents")
    val base = CurateMain.run(spark, docs, tmpDir("graft-curate-prop"))
    val star = CurateMain.run(spark, docs, dir, clusterAlgo = "star")
    // both connected-component algorithms label with the component min,
    // so the surviving canonical doc_ids must be exactly equal
    assert(star.afterNearDup === base.afterNearDup)
    val ids = (p: String) => spark.read.parquet(p)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(star.outputPath) === ids(base.outputPath))
    intercept[IllegalArgumentException] {
      CurateMain.run(spark, docs, tmpDir("graft-curate-bad"), clusterAlgo = "frobnicate")
    }
  }

  test("curate: scrubPii stage types PII before scoring and output") {
    import spark.implicits._
    val dir = tmpDir("graft-curate-pii")
    // inject PII into otherwise-normal docs so the stage has work to do
    val docs = Tables.load(spark, sf, "documents").limit(50)
      .withColumn("text",
        concat(col("text"), lit(" reach me at someone@example.com")))
    val r = CurateMain.run(spark, docs, dir, scrubPii = true)
    assert(r.afterNearDup > 0)
    val out = spark.read.parquet(r.outputPath)
    // no address survives; the typed placeholder does
    assert(out.filter(col("text").contains("@example.com")).count() === 0)
    assert(out.filter(col("text").contains("<EMAIL>")).count() === out.count())
  }
}
