package org.apache.spark.sql.graftshim

import org.apache.hadoop.fs.{FileStatus, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, Cast, Expression, Literal, Predicate}
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{StringType, StructType}

/** A parquet scan planned FROM A COMMIT LOG'S FILE LIST — no directory
  * listing, no `getFileStatus` calls, no parallel-discovery Spark job.
  *
  * `spark.read.parquet(paths: _*)` re-discovers what a versioned table's
  * log already states exactly: which files exist and how big they are.
  * That discovery is not free — above
  * `spark.sql.sources.parallelPartitionDiscovery.threshold` (default 32)
  * Spark launches a WHOLE JOB with one task per path just to fetch file
  * statuses (a 960-file version read spent 1.3 s there at bench scale,
  * ~45% of the query), and below it the driver still pays one filesystem
  * round-trip per file. At 100 TB the listing job is the difference
  * between metadata-only planning and a cluster-wide stat() storm per
  * read — the exact reason Delta plans scans off its own log through a
  * custom `TahoeFileIndex` rather than `spark.read.parquet`.
  *
  * This is that file index for the graft log: the caller hands
  * (relative path, size) pairs straight out of the manifest (`!bytes=`
  * stats), partition values are parsed from the `col=value` path
  * segments under the SAME unescape + user-schema cast rules the
  * built-in reader applies (inference stays off — values are strings
  * cast to the committed schema's type), and the relation is assembled
  * exactly as DataSource v1 would: `HadoopFsRelation` over
  * `ParquetFileFormat`, partition columns appended LAST. Everything
  * downstream — column pruning, parquet footer pushdown, `_metadata`
  * columns (the DV row-identity path), AQE — behaves identically to the
  * listed scan, because from the planner's view it IS the same relation,
  * only with the file statuses served from the log instead of the
  * filesystem. */
object LogFileIndex {

  /** One data file as the log records it: path relative to `root`
    * (partition dirs included), on-disk byte size. */
  final case class LogFile(relPath: String, size: Long)

  private final class Index(
      spark: SparkSession,
      root: Path,
      override val partitionSchema: StructType,
      dirs: Seq[(InternalRow, Array[FileStatus])]) extends FileIndex {
    override def rootPaths: Seq[Path] = Seq(root)
    // `partitionFilters` MUST prune here: FileSourceStrategy removes
    // partition-column predicates from the post-scan Filter on the
    // contract that the file index already applied them (partition
    // columns never exist inside the data files to re-check). Bind the
    // predicate to the partition schema and evaluate per directory —
    // the same prunePartitions shape PartitioningAwareFileIndex runs.
    // `dataFilters` stay in the plan; ignoring them is conservative.
    override def listFiles(partitionFilters: Seq[Expression],
        dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
      val kept =
        if (partitionFilters.isEmpty) dirs
        else {
          val bound = Predicate.createInterpreted(
            partitionFilters.reduce(And).transform {
              case a: AttributeReference =>
                val i = partitionSchema.indexWhere(_.name == a.name)
                require(i >= 0,
                  s"partition filter on unknown column ${a.name}")
                BoundReference(i, partitionSchema(i).dataType,
                  nullable = true)
            })
          dirs.filter { case (values, _) => bound.eval(values) }
        }
      kept.map { case (values, files) => PartitionDirectory(values, files) }
    }
    override def inputFiles: Array[String] =
      dirs.flatMap(_._2.map(_.getPath.toString)).toArray
    override def refresh(): Unit = ()
    override val sizeInBytes: Long =
      dirs.iterator.flatMap(_._2.iterator.map(_.getLen)).sum
  }

  /** Build the scan. `schema` is the schema the files are read under
    * (the committed schema, or its physical-name image under column
    * mapping) INCLUDING the partition columns; `partCols` names them in
    * directory-nesting order (empty for unpartitioned layouts). Output
    * columns are data columns in `schema` order with partition columns
    * appended last — the exact shape `reader.schema(schema).parquet`
    * produces, so callers' project-back logic is unchanged. */
  def scan(sparkAny: org.apache.spark.sql.SparkSession, rootDir: String,
      files: Seq[LogFile], schema: StructType,
      partCols: Seq[String]): DataFrame = {
    val spark = sparkAny.asInstanceOf[SparkSession]
    val root = new Path(rootDir)
    // asNullable mirrors DataSource.resolveRelation on user-specified
    // schemas: files written before an ADD COLUMN evolution lack the new
    // column and must read as NULL — a non-nullable field would make the
    // vectorized reader refuse the file ("Required column is missing")
    val nullable = schema.asNullable
    val partSchema = StructType(partCols.map(c => nullable(c)))
    val dataSchema = StructType(
      nullable.filterNot(f => partCols.contains(f.name)))
    val zone = Some(spark.sessionState.conf.sessionLocalTimeZone)

    // group files by partition directory, casting each dir's values once
    val byDir = new scala.collection.mutable.LinkedHashMap[
      String, scala.collection.mutable.ArrayBuffer[FileStatus]]()
    files.foreach { f =>
      val slash = f.relPath.lastIndexOf('/')
      val dir = if (slash < 0) "" else f.relPath.substring(0, slash)
      val st = new FileStatus(f.size, false, 0, 0, 0L,
        new Path(root, f.relPath))
      byDir.getOrElseUpdate(dir,
        new scala.collection.mutable.ArrayBuffer[FileStatus]()) += st
    }
    val dirs = byDir.toSeq.map { case (dir, sts) =>
      val segs = if (dir.isEmpty) Array.empty[String] else dir.split('/')
      val byName = segs.iterator.map { seg =>
        val eq = seg.indexOf('=')
        require(eq > 0, s"partition segment without '=': $seg")
        ExternalCatalogUtils.unescapePathName(seg.take(eq)) ->
          ExternalCatalogUtils.unescapePathName(seg.drop(eq + 1))
      }.toMap
      val values = partCols.map { c =>
        val raw = byName.getOrElse(c, throw new IllegalArgumentException(
          s"file dir '$dir' carries no value for partition column '$c'"))
        // the writer spells null/empty partition values as the Hive
        // default marker; the listed read maps it back to null
        if (raw == ExternalCatalogUtils.DEFAULT_PARTITION_NAME) null
        else Cast(Literal.create(raw, StringType), schema(c).dataType, zone)
          .eval(null)
      }
      (InternalRow.fromSeq(values), sts.toArray)
    }
    val relation = HadoopFsRelation(
      new Index(spark, root, partSchema, dirs),
      partitionSchema = partSchema,
      dataSchema = dataSchema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat(),
      options = Map.empty)(spark)
    Dataset.ofRows(spark, LogicalRelation(relation, isStreaming = false))
  }
}
