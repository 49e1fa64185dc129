package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, Expression, Predicate => CatalystPredicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.BaseRelation
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.TimeTravel

/** DECLARATIVE batch read of the [[TimeTravel]] versioned table — the
  * Delta read path (`spark.read.format("delta").option("versionAsOf",
  * N)`) on this log: `spark.read.format("graft-versioned")
  * .option("path", dir)` reads the LATEST version,
  * `option("versionAsOf", N)` / `option("timestampAsOf", ts)` time
  * travel, all through [[VersionedTableSourceProvider]]'s
  * `RelationProvider` face (reference analogue: the consumer examples
  * in README.md:13-28 are plain declarative reads of the export).
  *
  * The relation is a [[HadoopFsRelation]] over a LOG-BACKED
  * [[FileIndex]], NOT a row-producing `buildScan`: Spark's own
  * FileSourceStrategy plans it, so the scan is the native vectorized
  * parquet reader with whole-stage codegen, column pruning
  * (`ReadSchema`), parquet-level `PushedFilters`, AND partition
  * pruning — everything a hand-rolled RDD relation would forfeit.
  * What the log adds on top (exactly Delta's TahoeLogFileIndex split):
  *   - the FILE SET comes from the commit log, never a directory
  *     listing — stale files from superseded versions are invisible,
  *     and the chosen version stays frozen for the relation's lifetime
  *     (a consistent snapshot however many commits land meanwhile);
  *   - `listFiles` evaluates partition-column predicates against the
  *     directory values (O(dirs), exact — any predicate shape, not
  *     just ranges) and turns data-column range/equality conjuncts
  *     into [[TimeTravel.ColRange]] stats-skipping against the log's per-file
  *     min/max — files provably disjoint from the predicate are never
  *     even planned as splits, the same metadata-only pruning
  *     [[TimeTravel.readVersionSkippingAll]] does imperatively.
  *
  * At 100 TB: planning cost is one log resolve (O(retained files) in
  * the driver) plus one `listStatus` per partition directory — never a
  * recursive listing of superseded data, never a footer read; the
  * pruned splits then fan out to executors like any parquet scan.
  *
  * Column order note: like every `HadoopFsRelation`, the partition
  * column comes LAST in the relation's schema (data columns first);
  * select explicitly where order matters.
  */
object GraftVersionedRelation {

  def apply(spark: SparkSession, baseDir: String,
      versionAsOf: Option[Int], timestampAsOf: Option[String])
      : BaseRelation = {
    require(versionAsOf.isEmpty || timestampAsOf.isEmpty,
      "versionAsOf and timestampAsOf are mutually exclusive")
    val version = versionAsOf
      .orElse(timestampAsOf.map(ts =>
        TimeTravel.versionAsOf(spark, baseDir, parseTs(ts))))
      .getOrElse {
        val latest = TimeTravel.latestVersion(spark, baseDir)
        require(latest >= 1, s"$baseDir has no commits")
        latest
      }
    val index = new GraftVersionedFileIndex(spark, baseDir, version)
    HadoopFsRelation(index, index.partitionSchema, index.dataSchema,
      bucketSpec = None, new ParquetFileFormat,
      options = Map.empty)(spark)
  }

  /** `timestampAsOf` accepts epoch millis or a
    * `yyyy-MM-dd HH:mm:ss[.f…]` local timestamp (the
    * `java.sql.Timestamp.valueOf` shape Delta also takes). Shared with
    * the streaming source's `sinceTimestamp`. */
  private[graft] def parseTs(s: String): Long =
    try s.trim.toLong
    catch { case _: NumberFormatException =>
      java.sql.Timestamp.valueOf(s.trim).getTime }
}

/** The log-backed [[FileIndex]]: resolves version `version`'s file set
  * and schema from the commit log ONCE at construction; `listFiles`
  * prunes it per query from the pushed partition and data filters. */
final class GraftVersionedFileIndex(spark: SparkSession, baseDir: String,
    version: Int) extends FileIndex {

  private val plan = TimeTravel.scanPlan(spark, baseDir, version)

  // a HadoopFsRelation reads file columns by NAME: under an active
  // column mapping the files carry physical names, and the relation
  // would silently NULL-fill every renamed column — refuse loudly and
  // point at the mapping-aware imperative read instead
  require(plan.colmap.isEmpty,
    s"$baseDir has renamed columns (column mapping active) — the " +
      "declarative batch relation cannot project physical names; read " +
      "this version via TimeTravel.readVersion instead")

  // a HadoopFsRelation plans raw parquet splits: it cannot apply
  // deletion vectors, and silently scanning a DV-bound version would
  // RESURRECT deleted rows — the protocol-refusal every format makes
  // readers without DV support give (Delta gates DV tables behind a
  // reader-version bump for exactly this reason). readVersion applies
  // the vectors; compact materializes them away, after which this
  // relation reads the table again.
  require(!plan.hasDeletionVectors,
    s"version $version of $baseDir carries deletion vectors — a plain " +
      "parquet relation would resurrect deleted rows; read it via " +
      "TimeTravel.readVersion, or materialize with TimeTravel.compact")

  /** The table's partition column, from the file layout (every data
    * file lives under `col=value/`, the init/append invariant). */
  val partCol: String = {
    val f = plan.files.head
    val eq = f.indexOf('=')
    require(eq > 0 && f.indexOf('/') > eq,
      s"unpartitioned data file in the log: $f")
    f.substring(0, eq)
  }

  override val partitionSchema: StructType =
    StructType(Seq(StructField(partCol, StringType, nullable = false)))

  /** File-content schema: the committed schema minus the partition
    * column (which lives in directory names, not file data). */
  val dataSchema: StructType =
    StructType(plan.schema.fields.filterNot(_.name == partCol))

  private val dataRoot =
    new Path(new Path(baseDir), "data")
      .getFileSystem(spark.sessionState.newHadoopConf()) match {
        case fs => fs.makeQualified(new Path(new Path(baseDir), "data"))
      }

  override def rootPaths: Seq[Path] = Seq(dataRoot)

  /** One `listStatus` per partition directory, filtered to the
    * snapshot's files (superseded versions' files share the dirs but
    * are not in the log's file set) — lazy and cached: computed once
    * per relation, only when a scan actually plans. */
  private lazy val statusByFile: Map[String, FileStatus] = {
    val fs = dataRoot.getFileSystem(spark.sessionState.newHadoopConf())
    plan.files.groupBy(f => f.substring(0, f.indexOf('/')))
      .iterator.flatMap { case (dir, fls) =>
        val wanted = fls.map(f => f.substring(f.indexOf('/') + 1)).toSet
        fs.listStatus(new Path(dataRoot, dir)).iterator
          .filter(st => wanted(st.getPath.getName))
          .map(st => s"$dir/${st.getPath.getName}" -> st)
      }.toMap
  }

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // data-column conjuncts → log-stats skipping ([[TimeTravel
    // .predicateRanges]]; unsupported shapes simply don't prune —
    // conservative). The partition column is excluded: its values are
    // not in file stats, and the directory evaluation below prunes it
    // exactly, any predicate shape.
    val kept = plan.kept(dataFilters
      .flatMap(TimeTravel.predicateRanges)
      .filterNot(_.col == partCol))
    // partition-column predicates → exact evaluation per DIRECTORY
    // value (any predicate shape, evaluated once per dir, not per file)
    val keep: InternalRow => Boolean =
      if (partitionFilters.isEmpty) _ => true
      else {
        val bound = CatalystPredicate.createInterpreted(
          partitionFilters.reduce(And).transform {
            case _: AttributeReference =>
              BoundReference(0, StringType, nullable = false)
          })
        bound.initialize(0)
        bound.eval _
      }
    kept.groupBy(f => f.substring(0, f.indexOf('/'))).iterator
      .flatMap { case (dir, fls) =>
        val value = UTF8String.fromString(
          ExternalCatalogUtils.unescapePathName(
            dir.substring(dir.indexOf('=') + 1)))
        val row = InternalRow(value)
        if (!keep(row)) None
        else Some(PartitionDirectory(row,
          fls.flatMap(statusByFile.get).toArray))
      }.toSeq
  }

  override def inputFiles: Array[String] =
    plan.files.map(f => new Path(dataRoot, f).toString).toArray

  override def refresh(): Unit = () // the version is immutable

  override def sizeInBytes: Long = statusByFile.values.map(_.getLen).sum
}
