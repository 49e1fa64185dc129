package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Reading parquet written under an EVOLVING schema — the scale analogue
  * of the reference's user-reshaped schemas (its README's whole
  * customization story): a long-lived table accretes generations of files
  * as columns are added, and readers must see one superset relation with
  * NULL backfill for files that predate a column.
  *
  * Two read paths with very different 100 TB costs:
  *  - [[readMerged]] (`mergeSchema=true`) reconciles the union schema
  *    from FILE FOOTERS at read time — a distributed footer-reading job
  *    over the table's files before the real scan starts. Correct
  *    anywhere, but at catalog scale it is per-query overhead paid for
  *    schema information that rarely changes.
  *  - [[readAs]] pins the known superset schema (what a real catalog
  *    serves): zero discovery cost, same NULL backfill — parquet's
  *    reader fills absent columns per file. The production default; the
  *    footer merge is for schema DISCOVERY, not steady-state reads.
  * SchemaEvolutionSpec proves the two return identical relations on a
  * two-generation table, and q123 hash-checks the merged read against a
  * DuckDB union oracle. Column-level pushdown/pruning survive either
  * path (the spec checks PushedFilters on the merged plan): evolution
  * changes the schema, not the scan's efficiency. */
object SchemaEvolution {

  /** Union-of-footers read: `mergeSchema=true` parquet load. Files
    * missing one of the merged columns yield NULL for it. */
  def readMerged(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** Pinned-schema read: the caller supplies the (catalog's) superset
    * schema; absent columns NULL-backfill per file with no footer
    * reconciliation job. */
  def readAs(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).parquet(path)
}
