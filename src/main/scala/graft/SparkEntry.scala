package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Uses the 6-way star join (q05): exercises broadcast joins, pushdown
    * filters, and decimal-exact aggregation in one plan. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.q05.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for hash-seeded ops (MinHash,
    * SimHash, LSH ANN) → driver records a rows-only check. */
  def oracleSql: Map[String, String] = graft.queries.Registry.oracleSql

  /** Oracles whose SQL embeds data-dependent constants (e.g. q50's
    * Spark-computed k-means centroids as literals); Verify merges these
    * into oracle_sql.json alongside the static map. */
  def dynamicOracleSql(spark: SparkSession, sfDir: String): Map[String, String] =
    graft.queries.Registry.dynamicOracleSql(spark, sfDir)
}
