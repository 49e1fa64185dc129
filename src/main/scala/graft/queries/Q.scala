package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query: a Spark implementation plus (when the semantics are
  * SQL-expressible) an equivalent DuckDB oracle statement run by the driver
  * over the same parquet tables. `oracle=None` downgrades the driver check
  * to rows-only (used for hash-seeded ops whose exact values are
  * engine-specific, e.g. MinHash signatures).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")
