package graft.etl

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSpec, Tables}

/** Evolving-schema parquet reads: merged-footer discovery vs the
  * pinned-schema production path must agree exactly. */
class SchemaEvolutionSpec extends SparkSpec {

  import spark.implicits._

  /** A two-generation table: gen 1 without, gen 2 with `quality_score`. */
  private lazy val evolvedDir: String = {
    val d = tmpDir("graft-evolution")
    val docs = Tables.load(spark, sf, "documents")
    docs.filter($"doc_id" % 2 === 0).write.mode("append").parquet(d)
    docs.filter($"doc_id" % 2 =!= 0)
      .withColumn("quality_score", $"n_chars".cast(DoubleType) / 1000.0)
      .write.mode("append").parquet(d)
    d
  }

  test("merged read: superset schema, NULL backfill for the old generation") {
    val merged = SchemaEvolution.readMerged(spark, evolvedDir)
    assert(merged.columns.contains("quality_score"))
    val n = Tables.load(spark, sf, "documents").count()
    assert(merged.count() === n)
    // old-generation rows see NULL, new-generation rows the real value
    assert(merged.filter($"doc_id" % 2 === 0 && $"quality_score".isNotNull)
      .count() === 0L)
    assert(merged.filter($"doc_id" % 2 =!= 0 && $"quality_score".isNull)
      .count() === 0L)
  }

  test("pinned-schema read equals the merged read (the zero-discovery path)") {
    val merged = SchemaEvolution.readMerged(spark, evolvedDir)
    val pinned = SchemaEvolution.readAs(spark, evolvedDir, merged.schema)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id", $"lang", $"n_chars", $"quality_score")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toSet
    assert(key(pinned) === key(merged))
    assert(pinned.schema === merged.schema)
  }

  test("pushdown and pruning survive schema merging") {
    val merged = SchemaEvolution.readMerged(spark, evolvedDir)
      .filter($"n_chars" > 500L).select($"doc_id", $"quality_score")
    val plan = merged.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars,500)]"),
      s"filter not pushed:\n$plan")
    // the scan reads only what the projection needs
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,n_chars:bigint,quality_score:double>"),
      s"scan not pruned:\n$plan")
  }
}
