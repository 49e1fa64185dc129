package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query: a Spark implementation plus (when the semantics are
  * SQL-expressible) an equivalent DuckDB oracle statement run by the driver
  * over the same parquet tables. `oracle=None` downgrades the driver check
  * to rows-only (used for hash-seeded ops whose exact values are
  * engine-specific, e.g. MinHash signatures).
  *
  * `oracleGen` covers oracles that embed DATA-dependent constants (e.g.
  * q50's k-means-refined centroids): the SQL is built at Verify time with
  * the live session + scale-factor dir, Spark computes the constants once,
  * and the oracle carries them as literals — the q34 pattern, generalized.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "",
    oracleGen: Option[(SparkSession, String) => String] = None)
