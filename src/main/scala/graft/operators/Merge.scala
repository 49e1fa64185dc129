package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Key-count ceiling for broadcasting a merge batch's key set: ~4M
    * long keys ≈ tens of MB built once per executor — comfortably under
    * typical driver/executor memory; beyond it the discovery and anti
    * joins fall back to shuffle joins (slower, but they complete). */
  val DefaultBroadcastKeyLimit: Long = 4L * 1000 * 1000

  /** Broadcast `keys` only when the batch is plausibly build-side-sized;
    * a backfill-scale key set (billions of keys at 100 TB) must degrade
    * to a shuffle join, not force a driver-side broadcast build and OOM.
    * `upperBound` is a CHEAP over-estimate the caller already has (the
    * checkpointed batch's row count — one pass over materialized
    * partitions, no shuffle): when it clears the limit, the common
    * small-batch case decides without ever running the distinct
    * aggregation; only an over-limit bound pays the exact distinct
    * count before falling back to a shuffle join. */
  private[operators] def gateBroadcast(keys: DataFrame, limit: Long,
      upperBound: => Long): DataFrame =
    if (upperBound <= limit || keys.count() <= limit) broadcast(keys)
    else keys

  /** Full-row upsert of `updates` (same schema as the table, partition
    * column included) into the partitioned parquet table at `baseDir`,
    * keyed on `keyCol`. Idempotent for a fixed updates batch. Returns the
    * merged table re-read from `baseDir`. */
  def upsertPartitioned(spark: SparkSession, baseDir: String,
      updates: DataFrame, keyCol: String, partCol: String,
      broadcastKeyLimit: Long = DefaultBroadcastKeyLimit): DataFrame = {
    val base = spark.read.parquet(baseDir)
    // pinned: the updates batch feeds key discovery, target partitions,
    // the anti-join, and the merged union — four actions that would each
    // replay its upstream plan (for the streaming sink: the whole
    // micro-batch aggregation) without the checkpoint
    val ups = updates.localCheckpoint()
    val updKeys = gateBroadcast(ups.select(col(keyCol)).distinct(),
      broadcastKeyLimit, ups.count())
    val fromUpdates = ups.select(col(partCol)).distinct()
    val fromBase = base.join(updKeys, Seq(keyCol))
      .select(col(partCol)).distinct()
    // partition values as raw Any: partition-type inference may read the
    // column back as int/date/... even when it was written from strings
    val affected = fromUpdates.union(fromBase).distinct()
      .collect().map(_.get(0))
    requireNoNullPartition(affected, partCol)
    val current = base.filter(col(partCol).isin(affected.toSeq: _*))
    // repartition on the partition column BEFORE the partitioned write:
    // without it every shuffle task emits a file into every partition
    // directory it holds rows for (tasks × partitions small files per
    // merge — file-count churn that degrades the table and, under
    // repeated benching, the host); with it each rewritten partition
    // gets one task's worth of files — the compaction-aware write shape
    val merged = ups.unionByName(
      current.join(updKeys, Seq(keyCol), "left_anti")
        .select(ups.columns.map(col).toSeq: _*))
      .repartition(col(partCol))
      .localCheckpoint()
    val conf = spark.conf
    val prev = conf.getOption("spark.sql.sources.partitionOverwriteMode")
    conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try merged.write.mode("overwrite").partitionBy(partCol).parquet(baseDir)
    finally prev match {
      case Some(v) => conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    // a key MOVING partitions can empty its source partition entirely;
    // dynamic overwrite only replaces partitions present in the written
    // data, so an emptied source would keep its stale file (and the key
    // would surface twice). Drop those directories explicitly — the same
    // metadata-commit step the delete path performs.
    dropEmptiedPartitions(spark, baseDir, partCol, affected, merged)
    spark.read.parquet(baseDir)
  }

  /** NULL partition values have no `partCol=<v>` directory identity in
    * this copy-on-write scheme: `isin(affected)` would silently skip them
    * during the read-back (a moved key's stale row survives and the key
    * surfaces twice) and `dropEmptiedPartitions` would NPE AFTER the
    * overwrite landed. Fail fast BEFORE any write instead — a general
    * lakehouse layer models NULL as `__HIVE_DEFAULT_PARTITION__`, a
    * contract this parquet-native path deliberately does not enter. */
  private[operators] def requireNoNullPartition(affected: Seq[Any],
      partCol: String): Unit =
    require(!affected.contains(null),
      s"NULL value in partition column '$partCol': partition-granular " +
        "merge/delete cannot address the null partition; filter or " +
        "default the partition value upstream")

  /** Tuple variant for multi-column layouts: refuse a NULL in ANY
    * partition component (the tuple has no directory identity). */
  private[operators] def requireNoNullPartitionTuple(
      affected: Seq[Seq[Any]], partCols: Seq[String]): Unit =
    affected.foreach { vs =>
      vs.zip(partCols).foreach { case (v, c) =>
        require(v != null,
          s"NULL value in partition column '$c': partition-granular " +
            "merge/delete cannot address the null partition; filter or " +
            "default the partition value upstream")
      }
    }

  /** Remove `partCol=<v>` directories for affected partition values that
    * the rewritten data no longer contains. Directory names use Hive
    * partition-path escaping (the same encoding Spark's dynamic partition
    * writer used to CREATE them), so values containing '/', ':', spaces
    * etc. resolve to the real directory rather than a phantom path. */
  private def dropEmptiedPartitions(spark: SparkSession, baseDir: String,
      partCol: String, affected: Seq[Any], written: DataFrame): Unit = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    val present = written.select(col(partCol)).distinct()
      .collect().map(_.get(0).toString).toSet
    val fs = new org.apache.hadoop.fs.Path(baseDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    affected.map(_.toString).filterNot(present).foreach { p =>
      val dir = s"$partCol=${ExternalCatalogUtils.escapePathName(p)}"
      fs.delete(new org.apache.hadoop.fs.Path(baseDir, dir), true)
    }
  }

  /** Targeted DELETE by key set — the right-to-be-forgotten / GDPR path,
    * copy-on-write at the same partition granularity as the upsert:
    * partitions holding a doomed key are found with the column-pruned
    * discovery join, ONLY those are read back and rewritten minus the
    * matched rows, and everything else is untouched. Deleting keys not
    * present (including a re-run of the same delete) touches zero
    * partitions and writes nothing. Returns the table re-read. */
  def deletePartitioned(spark: SparkSession, baseDir: String,
      keys: DataFrame, keyCol: String, partCol: String,
      broadcastKeyLimit: Long = DefaultBroadcastKeyLimit): DataFrame = {
    val base = spark.read.parquet(baseDir)
    val checkpointedKeys = keys.select(col(keyCol)).distinct()
      .localCheckpoint()
    val delKeys = gateBroadcast(checkpointedKeys, broadcastKeyLimit,
      checkpointedKeys.count())
    // raw Any partition values — inference may type them non-string
    val affected = base.join(delKeys, Seq(keyCol))
      .select(col(partCol)).distinct().collect().map(_.get(0))
    requireNoNullPartition(affected, partCol)
    if (affected.nonEmpty) {
      val survivors = base.filter(col(partCol).isin(affected.toSeq: _*))
        .join(delKeys, Seq(keyCol), "left_anti")
        .repartition(col(partCol)) // one task per rewritten partition
        .localCheckpoint()
      val conf = spark.conf
      val prev = conf.getOption("spark.sql.sources.partitionOverwriteMode")
      conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try survivors.write.mode("overwrite").partitionBy(partCol)
        .parquet(baseDir)
      finally prev match {
        case Some(v) => conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
      // dynamic overwrite replaces only partitions PRESENT in the written
      // data — a partition whose every row was deleted has no survivors
      // and would silently keep its stale files; drop those directories
      // explicitly (the step a table format's metadata commit does)
      dropEmptiedPartitions(spark, baseDir, partCol, affected, survivors)
    }
    spark.read.parquet(baseDir)
  }

  /** Snapshot DIFF: classify every key across two table versions as
    * added / removed / changed / unchanged and count which columns
    * changed — the audit a pipeline runs between two exports (and the
    * natural verification of a merge: diff(before, applied-merge) must
    * equal the merge batch exactly). One full-outer key join; comparisons
    * are row-local; the output is a single summary row of exact BIGINT
    * counts, with one changed-count column per compared attribute.
    * NULL-safe equality (`<=>`) so NULL→value transitions count as
    * changes, not as equality with the absent. */
  def snapshotDiff(before: DataFrame, after: DataFrame, keyCol: String,
      compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "compareCols must be non-empty")
    val b = before.select((keyCol +: compareCols).map(c =>
      col(c).as(s"b_$c")): _*)
    val a = after.select((keyCol +: compareCols).map(c =>
      col(c).as(s"a_$c")): _*)
    val j = b.join(a, col(s"b_$keyCol") === col(s"a_$keyCol"), "full_outer")
    val added = col(s"b_$keyCol").isNull
    val removed = col(s"a_$keyCol").isNull
    val anyChanged = compareCols.map(c =>
      !(col(s"b_$c") <=> col(s"a_$c"))).reduce(_ || _)
    // coalesce: sum over an empty join (both snapshots empty) is NULL,
    // and an empty diff must report zeros, not NULLs
    def zsum(c: Column): Column = coalesce(sum(c), lit(0L))
    val aggs =
      zsum(when(added, 1L).otherwise(0L)).as("n_added") +:
        zsum(when(removed, 1L).otherwise(0L)).as("n_removed") +:
        zsum(when(!added && !removed && anyChanged, 1L).otherwise(0L))
          .as("n_changed") +:
        zsum(when(!added && !removed && !anyChanged, 1L).otherwise(0L))
          .as("n_unchanged") +:
        compareCols.map(c =>
          zsum(when(!added && !removed && !(col(s"b_$c") <=> col(s"a_$c")), 1L)
            .otherwise(0L)).as(s"changed_$c"))
    j.agg(aggs.head, aggs.tail: _*)
  }
}
