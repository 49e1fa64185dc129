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
    // an EMPTY snapshot (CREATE-TABLE-empty v1, or a restore to it):
    // a typed zero-row relation — no files to plan
    TimeTravel.emptySchemaAt(spark, baseDir, version) match {
      case Some(s) => new GraftEmptyRelation(spark, s)
      case None =>
        val plan = TimeTravel.scanPlan(spark, baseDir, version)
        // FAST PATH — plain snapshots: a HadoopFsRelation plans raw
        // parquet splits (vectorized reader, whole-stage codegen,
        // parquet-level PushedFilters). It reads file columns by NAME
        // and cannot inject an anti-join, so two snapshot states need
        // the MERGE-ON-READ relation instead: an active column mapping
        // (files carry physical names the relation must project back
        // to logical) and deletion-vector bindings (a raw split scan
        // would resurrect deleted rows — the hazard Delta gates behind
        // a reader-version bump).
        if (plan.colmap.isEmpty && !plan.hasDeletionVectors) {
          val index = new GraftVersionedFileIndex(spark, baseDir,
            version, plan)
          HadoopFsRelation(index, index.partitionSchema,
            index.dataSchema, bucketSpec = None, new ParquetFileFormat,
            options = Map.empty)(spark)
        } else new GraftVersionedMorRelation(spark, baseDir, version,
          plan)
    }
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

/** The log-backed [[FileIndex]]: the resolved `plan` of `version`
  * (file set + schema, resolved once by the provider); `listFiles`
  * prunes it per query from the pushed partition and data filters.
  * Reaches only plain snapshots — [[GraftVersionedRelation.apply]]
  * routes column-mapped and DV-bound versions to the merge-on-read
  * relation instead. */
private[graft] final class GraftVersionedFileIndex(spark: SparkSession,
    baseDir: String, version: Int, plan: TimeTravel.ScanPlan)
    extends FileIndex {

  private def dirOf(f: String): String = {
    val i = f.lastIndexOf('/')
    if (i < 0) "" else f.substring(0, i)
  }

  /** The table's partition columns, from the file layout (every data
    * file lives under `a=v/b=w/…`, the init/append invariant; a
    * root-level file means the table is unpartitioned). */
  val partCols: Seq[String] = {
    val segs = plan.files.head.split('/')
    segs.iterator.take(segs.length - 1)
      .map(seg => seg.substring(0, seg.indexOf('='))).toSeq
  }

  /** Partition columns keep their COMMITTED types (typed layouts:
    * a DATE or INT partition value casts from its directory text). */
  override val partitionSchema: StructType =
    StructType(partCols.map(c =>
      StructField(c, plan.schema(c).dataType, nullable = false)))

  /** File-content schema: the committed schema minus the partition
    * columns (which live in directory names, not file data). */
  val dataSchema: StructType =
    StructType(plan.schema.fields.filterNot(f => partCols.contains(f.name)))

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
    plan.files.groupBy(dirOf)
      .iterator.flatMap { case (dir, fls) =>
        val wanted = fls.map(f => f.substring(f.lastIndexOf('/') + 1)).toSet
        val p = if (dir.isEmpty) dataRoot else new Path(dataRoot, dir)
        fs.listStatus(p).iterator
          .filter(st => st.isFile && wanted(st.getPath.getName))
          .map(st => (if (dir.isEmpty) st.getPath.getName
            else s"$dir/${st.getPath.getName}") -> st)
      }.toMap
  }

  /** Directory text → typed partition value (Catalyst internal form). */
  private val converters: Seq[String => Any] =
    partitionSchema.fields.map { f =>
      f.dataType match {
        case StringType => (s: String) => UTF8String.fromString(s)
        case dt => (s: String) =>
          org.apache.spark.sql.catalyst.expressions.Cast(
            org.apache.spark.sql.catalyst.expressions.Literal
              .create(UTF8String.fromString(s), StringType), dt,
            Some(java.time.ZoneId.systemDefault().getId)).eval(null)
      }
    }.toSeq

  private def partitionRow(dir: String): InternalRow =
    if (partCols.isEmpty) InternalRow.empty
    else {
      val segs = dir.split('/')
      InternalRow.fromSeq(partCols.indices.map { i =>
        val seg = segs(i)
        converters(i)(ExternalCatalogUtils.unescapePathName(
          seg.substring(seg.indexOf('=') + 1)))
      })
    }

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // data-column conjuncts → log-stats skipping ([[TimeTravel
    // .predicateRanges]]; unsupported shapes simply don't prune —
    // conservative). Partition columns are excluded: their values are
    // not in file stats, and the directory evaluation below prunes
    // them exactly, any predicate shape.
    val kept = plan.kept(dataFilters
      .flatMap(TimeTravel.predicateRanges)
      .filterNot(r => partCols.contains(r.col)))
    // partition-column predicates → exact evaluation per DIRECTORY
    // tuple (any predicate shape, evaluated once per dir, not per file)
    val ordinal = partCols.zipWithIndex.toMap
    val keep: InternalRow => Boolean =
      if (partitionFilters.isEmpty) _ => true
      else {
        val bound = CatalystPredicate.createInterpreted(
          partitionFilters.reduce(And).transform {
            case a: AttributeReference =>
              val i = ordinal.getOrElse(a.name,
                throw new IllegalStateException(
                  s"partition filter on non-partition column ${a.name}"))
              BoundReference(i, partitionSchema.fields(i).dataType,
                nullable = false)
          })
        bound.initialize(0)
        bound.eval _
      }
    kept.groupBy(dirOf).iterator
      .flatMap { case (dir, fls) =>
        val row = partitionRow(dir)
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

/** MERGE-ON-READ declarative relation — the read path for snapshot
  * states a raw-split [[HadoopFsRelation]] cannot represent: versions
  * with deletion-vector bindings (positions must anti-join out, or
  * deleted rows resurrect) and versions under an active column mapping
  * (files carry physical names that must project back to the
  * version's logical schema). The Delta analogue is its DV-aware scan
  * planning: the declarative surface keeps working the moment a team
  * adopts merge-on-read deletes, instead of breaking until a
  * compaction materializes the vectors.
  *
  * Pushed filters do BOTH kinds of work they do on the fast path:
  *   - file skipping: pushed conjuncts translate to
  *     [[TimeTravel.ColRange]]s and prune the version's file list via
  *     the log's stats (range + bloom), BEFORE any data is planned;
  *   - parquet pushdown: the same conjuncts re-apply as `Column`
  *     filters INSIDE the body scan, where Catalyst pushes them
  *     through the DV anti-join down to the vectorized parquet reader
  *     (the inner scan shows its own PushedFilters).
  * Everything stays distributed: the body is [[TimeTravel]]'s normal
  * file-list scan (vectorized parquet + broadcast anti-join on only
  * the DV-bound files); the only seam is the Row boundary every V1
  * `buildScan` has. All filters report unhandled, so Spark re-applies
  * them above the scan — pruning is a superset optimization, exactly
  * the PushedFilters contract.
  *
  * At 100 TB: planning is one log resolve plus O(dirs) listings (for
  * `sizeInBytes`), skipping is metadata-only, and the scan fans out
  * like any parquet read. The relation is the TRANSITIONAL-state
  * reader by design — compaction materializes DVs away and the
  * provider routes back to the codegen fast path. */
private[graft] final class GraftVersionedMorRelation(spark: SparkSession,
    baseDir: String, version: Int,
    plan: TimeTravel.ScanPlan) extends BaseRelation
    with org.apache.spark.sql.sources.PrunedFilteredScan {

  import org.apache.spark.sql.sources
  import org.apache.spark.sql.sources.{Filter, EqualTo, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan, LessThanOrEqual, StringContains, StringEndsWith, StringStartsWith}
  import org.apache.spark.sql.functions.{col, lit}

  override def sqlContext: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  override val schema: StructType = plan.schema

  /** Real bytes (one listing per partition dir, computed once):
    * keeps the optimizer from broadcasting a large snapshot by
    * default-size accident. */
  override lazy val sizeInBytes: Long = plan.sizeInBytes

  /** Skipping is a SUPERSET prune — every filter re-applies above. */
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters

  /** Pushed conjuncts → stats ranges (file skipping). Only shapes the
    * log's min/max can answer translate; everything else prunes
    * nothing — conservative, never wrong. */
  private def ranges(f: Filter): Seq[TimeTravel.ColRange] = f match {
    case EqualTo(a, v) => Seq(TimeTravel.ColRange(a, v, v))
    case GreaterThan(a, v) => Seq(TimeTravel.ColRange(a, v, null))
    case GreaterThanOrEqual(a, v) => Seq(TimeTravel.ColRange(a, v, null))
    case LessThan(a, v) => Seq(TimeTravel.ColRange(a, null, v))
    case LessThanOrEqual(a, v) => Seq(TimeTravel.ColRange(a, null, v))
    case sources.And(l, r) => ranges(l) ++ ranges(r)
    case _ => Nil
  }

  /** Pushed filters → `Column`s for the INNER scan (parquet-level
    * pushdown through the DV anti-join); None = not expressible here,
    * the outer Filter still applies it. */
  private def toColumn(f: Filter): Option[org.apache.spark.sql.Column] =
    f match {
      case EqualTo(a, v) => Some(col(a) === lit(v))
      case GreaterThan(a, v) => Some(col(a) > lit(v))
      case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
      case LessThan(a, v) => Some(col(a) < lit(v))
      case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
      case In(a, vs) => Some(col(a).isin(vs.toSeq: _*))
      case IsNull(a) => Some(col(a).isNull)
      case IsNotNull(a) => Some(col(a).isNotNull)
      case StringStartsWith(a, p) => Some(col(a).startsWith(p))
      case StringEndsWith(a, p) => Some(col(a).endsWith(p))
      case StringContains(a, p) => Some(col(a).contains(p))
      case sources.And(l, r) => for { lc <- toColumn(l); rc <- toColumn(r) }
        yield lc && rc
      case sources.Or(l, r) => for { lc <- toColumn(l); rc <- toColumn(r) }
        yield lc || rc
      case sources.Not(c) => toColumn(c).map(!_)
      case _ => None
    }

  /** The ANALYZED logical plan of this relation's merge-on-read scan,
    * file-skipped by `preds` — the [[graft.plans.MorScanRewrite]]
    * hook: the optimizer rule splices this plan (native parquet scans
    * + the DV anti-join, full codegen) in place of the V1 relation,
    * which only remains as the rule-less fallback with its Row
    * boundary. */
  /** `cond`: the query's own filter over this relation, remapped onto
    * the scan's attributes and optimized WITH the subplan — the splice
    * happens in the LATE user-rules batch, after Spark's own pushdown
    * already ran, so the inner optimization is what carries the
    * predicate through the DV anti-join down to the parquet readers.
    * The subplan must also be the OPTIMIZED plan (not analyzed): the
    * early batches (hint resolution, subquery cleanup) have already
    * run on the outer query, and an un-eliminated ResolvedHint would
    * reach the planner and fail. The subplan holds no MOR relations,
    * so its own optimization cannot recurse into the rule. */
  /** `required`: the PARENT's needed columns (None = all) — the splice
    * runs in the late user-rules batch, AFTER Spark's own ColumnPruning,
    * so the subplan must carry the projection itself or a narrow query
    * over a DV-bound version physically reads every column. The select
    * lands BELOW the inner optimization, which prunes the parquet
    * ReadSchema down to projection + filter references. */
  private[graft] def logicalScan(preds: Seq[TimeTravel.ColRange],
      cond: Option[org.apache.spark.sql.catalyst.expressions.Expression],
      required: Option[Seq[String]] = None)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    val base = plan.readKept(preds).queryExecution.analyzed
    val byName = base.output.map(a => a.name -> a).toMap
    val withFilter = cond.fold(base) { c =>
      val remapped = c.transform {
        case a: AttributeReference => byName.getOrElse(a.name,
          throw new IllegalStateException(
            s"MOR scan lacks filter column '${a.name}' " +
              s"(has: ${base.output.map(_.name).mkString(", ")})"))
      }
      org.apache.spark.sql.catalyst.plans.logical.Filter(remapped, base)
    }
    val projected = required.fold(withFilter) { names =>
      org.apache.spark.sql.catalyst.plans.logical.Project(
        names.map(n => byName.getOrElse(n,
          throw new IllegalStateException(
            s"MOR scan lacks required column '$n' " +
              s"(has: ${base.output.map(_.name).mkString(", ")})"))),
        withFilter)
    }
    spark.sessionState.executePlan(projected).optimizedPlan
  }

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter])
      : org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = {
    // fast-path discoverability: a vanilla session (no GraftExtensions /
    // installOptimizations) reaches this correct-but-Row-boundary V1
    // fallback — say so ONCE per JVM instead of silently serving the
    // slow path forever
    if (!spark.conf.get("spark.graft.mor.rewrite", "false").toBoolean &&
        GraftVersionedMorRelation.slowPathWarned.compareAndSet(false, true)) {
      GraftVersionedMorRelation.slowPathWarnings.incrementAndGet()
      org.slf4j.LoggerFactory.getLogger(classOf[GraftVersionedMorRelation])
        .warn(s"serving $baseDir@v$version through the V1 merge-on-read " +
          "fallback (Row boundary, no whole-stage codegen): install " +
          "graft.GraftSession.installOptimizations(spark) or the " +
          "GraftExtensions session extension to enable the optimized " +
          "MorScanRewrite splice")
    }
    val body = plan.readKept(filters.flatMap(ranges).toSeq)
    val filtered = filters.flatMap(toColumn)
      .foldLeft(body)((df, c) => df.filter(c))
    // empty projection (COUNT(*)) still needs the row CARDINALITY
    val projected =
      if (requiredColumns.isEmpty) filtered.select()
      else filtered.select(requiredColumns.map(col).toIndexedSeq: _*)
    projected.rdd
  }

  override def toString: String =
    s"GraftVersionedMorRelation[$baseDir@v$version, " +
      s"dv=${plan.hasDeletionVectors}, mapped=${plan.colmap.nonEmpty}]"
}

/** A typed ZERO-ROW relation — the declarative face of an empty
  * snapshot (a CREATE-TABLE-empty v1 before its first batch). */
private[graft] final class GraftEmptyRelation(spark: SparkSession,
    override val schema: StructType) extends BaseRelation
    with org.apache.spark.sql.sources.TableScan {
  override def sqlContext: org.apache.spark.sql.SQLContext =
    spark.sqlContext
  override def buildScan()
      : org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] =
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row]
  override def sizeInBytes: Long = 0L
}

private[graft] object GraftVersionedMorRelation {
  /** One-time latch + observable count for the V1 slow-path warning
    * (spec-asserted: fires exactly once per JVM). */
  private[graft] val slowPathWarned =
    new java.util.concurrent.atomic.AtomicBoolean(false)
  private[graft] val slowPathWarnings =
    new java.util.concurrent.atomic.AtomicLong(0L)
}
