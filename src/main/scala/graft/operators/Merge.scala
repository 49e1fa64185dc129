package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keyed MERGE-upsert into a partitioned parquet table, copy-on-write at
  * partition granularity — the lakehouse write path (Delta/Iceberg MERGE
  * INTO semantics: WHEN MATCHED THEN UPDATE ALL / WHEN NOT MATCHED THEN
  * INSERT ALL) expressed over plain parquet.
  *
  * The 100 TB shape: a merge batch is small relative to the table, so the
  * cost that matters is how much of the table gets REWRITTEN. This
  * operator rewrites only the partitions the merge can actually change:
  *   1. target partitions named by the update rows themselves, plus
  *   2. partitions currently holding a matched key's row (a key may move
  *      partitions when its partition-defining attribute changes) — found
  *      with a column-pruned scan of (key, partition) joined against the
  *      broadcast update-key set, the same touched-file discovery join
  *      Delta's MERGE plans.
  * The affected-partition list is collected to the driver (it is the
  * pruned file manifest, bounded by the merge batch's partition spread,
  * not by table size), the current rows of ONLY those partitions are read
  * back through a partition-pruned scan, and the merged result replaces
  * exactly those directories via dynamic partition overwrite. Untouched
  * partitions are never read past their footer nor rewritten.
  *
  * `localCheckpoint` before the write stands in for the transactional
  * metadata swap a table format provides: it materializes the merged rows
  * so the overwrite does not stream from the very files it is replacing
  * (Spark refuses that plan, correctly). On a cluster with a real
  * lakehouse layer, the swap is a manifest commit instead; the dataflow —
  * prune, rewrite-some, publish — is identical.
  */
object Merge {

  /** Full-row upsert of `updates` (same schema as the table, partition
    * column included) into the partitioned parquet table at `baseDir`,
    * keyed on `keyCol`. Idempotent for a fixed updates batch. Returns the
    * merged table re-read from `baseDir`. */
  def upsertPartitioned(spark: SparkSession, baseDir: String,
      updates: DataFrame, keyCol: String, partCol: String): DataFrame = {
    val base = spark.read.parquet(baseDir)
    val updKeys = updates.select(col(keyCol)).distinct()
    val fromUpdates = updates.select(col(partCol)).distinct()
    val fromBase = base.join(broadcast(updKeys), Seq(keyCol))
      .select(col(partCol)).distinct()
    val affected = fromUpdates.union(fromBase).distinct()
      .collect().map(_.getString(0)).sorted
    val current = base.filter(col(partCol).isin(affected.toSeq: _*))
    val merged = updates.unionByName(
      current.join(broadcast(updKeys), Seq(keyCol), "left_anti")
        .select(updates.columns.map(col).toSeq: _*))
      .localCheckpoint()
    val conf = spark.conf
    val prev = conf.getOption("spark.sql.sources.partitionOverwriteMode")
    conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try merged.write.mode("overwrite").partitionBy(partCol).parquet(baseDir)
    finally prev match {
      case Some(v) => conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    spark.read.parquet(baseDir)
  }
}
