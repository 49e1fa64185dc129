package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.functions._

/** VERSIONED copy-on-write table — the minimal Delta-log idea on plain
  * parquet: data files are append-only under `baseDir/data/`, and each
  * commit writes a manifest (`baseDir/_graft_log/<N>.manifest`, a sorted
  * newline-separated list of the data files constituting version N). A
  * version is its manifest's file list, nothing else: `readVersion`
  * reads exactly those files, so EVERY committed version stays readable
  * after later commits — the property the in-place [[Merge]] path cannot
  * offer, because dynamic partition overwrite physically deletes the
  * files an old version would need. Snapshot diffs between versions
  * therefore need no re-run of any merge: two manifest reads and one
  * [[Merge.snapshotDiff]].
  *
  * Commit mechanics mirror a real table format scaled to essentials:
  *   - writes never mutate: a merge APPENDS the rewritten partitions'
  *     rows as new uniquely-named part files, and the new manifest is
  *     (previous manifest minus affected partitions' files) + the files
  *     just written. Untouched partitions' files carry over by NAME —
  *     zero data movement, byte-identical across versions.
  *   - an emptied partition simply contributes no files to the new
  *     manifest; nothing is physically deleted (time travel is why).
  *     Reclaiming files no manifest references is a VACUUM, deliberately
  *     out of scope.
  *   - the manifest is created with `FileSystem.create(overwrite=false)`
  *     — two writers racing to commit the same version: exactly one
  *     wins, the loser gets an error, the optimistic-concurrency
  *     primitive every log-structured format builds on. (The operator
  *     contract is single-writer; the exclusive create is the guard
  *     rail, not a transaction manager.)
  *
  * Scale shape: identical to [[Merge.upsertPartitioned]] — the pruned
  * discovery join bounds the rewrite by the batch's partition spread;
  * the driver holds only the affected-partition values and the
  * manifest's file list (file-count-bounded metadata, the same thing a
  * Delta commit holds). Reads are manifest-pruned: `readVersion` hands
  * Spark the exact file list, so planning never lists the directory. */
object TimeTravel {

  private def hadoopFs(spark: SparkSession, baseDir: String): FileSystem =
    new Path(baseDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dataDir(baseDir: String) = new Path(baseDir, "data")
  private def logDir(baseDir: String) = new Path(baseDir, "_graft_log")

  /** Relative (to data/) paths of all parquet data files currently on
    * disk — used to compute "files this write just created" by listing
    * before and after (sound under the documented single-writer
    * contract). */
  private def listDataFiles(fs: FileSystem, baseDir: String): Set[String] = {
    val root = fs.makeQualified(dataDir(baseDir))
    if (!fs.exists(root)) Set.empty
    else {
      // qualify BOTH sides before relativizing: listFiles returns
      // scheme-qualified URIs (file:/…), and relativize against a
      // scheme-less root silently returns the absolute URI unchanged
      val it = fs.listFiles(root, true)
      val b = Set.newBuilder[String]
      while (it.hasNext) {
        val f = fs.makeQualified(it.next().getPath)
        if (f.getName.endsWith(".parquet"))
          b += root.toUri.relativize(f.toUri).getPath
      }
      b.result()
    }
  }

  /** Latest committed version, 0 if the table has no log yet. */
  def latestVersion(spark: SparkSession, baseDir: String): Int = {
    val fs = hadoopFs(spark, baseDir)
    val ld = logDir(baseDir)
    if (!fs.exists(ld)) 0
    else fs.listStatus(ld).map(_.getPath.getName)
      .collect { case n if n.endsWith(".manifest") =>
        n.stripSuffix(".manifest").toInt }
      .foldLeft(0)(math.max)
  }

  private def readManifest(fs: FileSystem, baseDir: String,
      version: Int): Seq[String] = {
    val p = new Path(logDir(baseDir), s"$version.manifest")
    require(fs.exists(p), s"version $version has no manifest under $baseDir")
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).toList
    finally in.close()
  }

  /** Commit `files` (relative data paths) as `version`. Exclusive
    * create: committing an already-committed version throws. */
  private def writeManifest(fs: FileSystem, baseDir: String, version: Int,
      files: Seq[String]): Unit = {
    fs.mkdirs(logDir(baseDir))
    val p = new Path(logDir(baseDir), s"$version.manifest")
    val out = fs.create(p, false) // never overwrite a committed version
    try out.write(files.sorted.mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** Manifest entries are matched to partitions by DIRECTORY TEXT, so a
    * partition value must round-trip identically: written dir name →
    * read-back value → re-escaped dir name. Partition-type INFERENCE
    * breaks that round trip (a string "01" written as `part=01` reads
    * back as int 1 and re-renders as `part=1` — the kept-file filter then
    * misses the old directory and a delete silently resurrects rows). The
    * versioned table therefore pins the contract both ways: the partition
    * column must be STRING at every write, and reads disable inference so
    * directory text comes back verbatim. */
  private def requireStringPartCol(df: DataFrame, partCol: String): Unit =
    require(df.schema(partCol).dataType ==
      org.apache.spark.sql.types.StringType,
      s"partition column '$partCol' must be STRING: manifest matching " +
        "round-trips partition values as directory text")

  private def withoutPartitionInference[A](spark: SparkSession)(f: => A): A = {
    val key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try f finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** The table AS OF `version`: exactly the manifest's files, with the
    * partition column recovered (as STRING — see
    * [[requireStringPartCol]]) via basePath. */
  def readVersion(spark: SparkSession, baseDir: String,
      version: Int): DataFrame = {
    val fs = hadoopFs(spark, baseDir)
    val files = readManifest(fs, baseDir, version)
    require(files.nonEmpty, s"version $version of $baseDir is empty — " +
      "schemaless empty snapshots are not representable on plain parquet")
    val root = dataDir(baseDir).toString
    withoutPartitionInference(spark) {
      spark.read.option("basePath", root)
        .parquet(files.map(f => s"$root/$f"): _*)
    }
  }

  /** Create the table: write `df` partitioned by `partCol`, commit v1.
    * The partition column must be STRING and NULL-free — NULLs would
    * write `__HIVE_DEFAULT_PARTITION__` rows that the (deliberately
    * NULL-rejecting) upsert/delete paths could never touch again. */
  def init(spark: SparkSession, baseDir: String, df: DataFrame,
      partCol: String): Int = {
    val fs = hadoopFs(spark, baseDir)
    require(latestVersion(spark, baseDir) == 0,
      s"$baseDir already has commits")
    requireStringPartCol(df, partCol)
    require(df.filter(col(partCol).isNull).isEmpty,
      s"NULL values in partition column '$partCol': such rows could " +
        "never be updated or deleted — default the value upstream")
    df.repartition(col(partCol)) // one task's files per partition dir
      .write.mode("append").partitionBy(partCol)
      .parquet(dataDir(baseDir).toString)
    writeManifest(fs, baseDir, 1, listDataFiles(fs, baseDir).toSeq)
    1
  }

  /** The escaped `partCol=<v>` directory prefix for each affected
    * partition value — how manifest entries are matched to partitions. */
  private def affectedDirs(partCol: String, affected: Seq[Any]): Set[String] =
    affected.map(v =>
      s"$partCol=${ExternalCatalogUtils.escapePathName(v.toString)}").toSet

  private def commitRewrite(spark: SparkSession, baseDir: String,
      partCol: String, affected: Seq[Any], prev: Int,
      rewritten: DataFrame): Int = {
    val fs = hadoopFs(spark, baseDir)
    val before = listDataFiles(fs, baseDir)
    rewritten.repartition(col(partCol))
      .write.mode("append").partitionBy(partCol)
      .parquet(dataDir(baseDir).toString)
    val newFiles = (listDataFiles(fs, baseDir) -- before).toSeq
    val dirs = affectedDirs(partCol, affected)
    val kept = readManifest(fs, baseDir, prev)
      .filterNot(f => dirs.exists(d => f.startsWith(d + "/")))
    // refuse BEFORE the manifest lands: an all-rows-gone commit would be
    // an empty manifest — unreadable on plain parquet (no schema source)
    // and, as the latest version, it would block every later commit. The
    // table stays at `prev`; the just-appended files are unreferenced
    // orphans a vacuum reclaims.
    require(kept.nonEmpty || newFiles.nonEmpty,
      "commit would empty the table — an empty version is not " +
        "representable on plain parquet; drop the table instead")
    writeManifest(fs, baseDir, prev + 1, kept ++ newFiles)
    prev + 1
  }

  /** MERGE INTO as a new version: same pruned-discovery semantics as
    * [[Merge.upsertPartitioned]] (update-by-key, insert-new-keys,
    * cross-partition key moves covered), but the prior version remains
    * readable. Returns the committed version number. */
  def upsert(spark: SparkSession, baseDir: String, updates: DataFrame,
      keyCol: String, partCol: String): Int = {
    val prev = latestVersion(spark, baseDir)
    require(prev >= 1, s"$baseDir has no commits — call init first")
    requireStringPartCol(updates, partCol)
    val base = readVersion(spark, baseDir, prev)
    val ups = updates.localCheckpoint()
    val updKeys = ups.select(col(keyCol)).distinct()
    val affected = ups.select(col(partCol)).distinct()
      .union(base.join(broadcast(updKeys), Seq(keyCol))
        .select(col(partCol)).distinct())
      .distinct().collect().map(_.get(0)).toSeq
    Merge.requireNoNullPartition(affected, partCol)
    if (affected.isEmpty) return prev // empty batch: nothing to commit
    val current = base.filter(col(partCol).isin(affected: _*))
    val merged = ups.unionByName(
      current.join(broadcast(updKeys), Seq(keyCol), "left_anti")
        .select(ups.columns.map(col).toSeq: _*))
      .localCheckpoint() // don't re-plan the discovery work in the write
    commitRewrite(spark, baseDir, partCol, affected, prev, merged)
  }

  /** VACUUM: physically reclaim data files that no RETAINED version
    * references — the retention boundary every log-structured format
    * pairs with time travel (old versions are free until you choose to
    * stop paying for them). Versions `keepFrom..latest` stay fully
    * readable; manifests below `keepFrom` are dropped so no surviving
    * manifest can reference a deleted file (vacuuming data out from
    * under a live manifest is the one unforgivable state). A file shared
    * by old and retained versions survives — membership is decided
    * against the UNION of retained manifests, never per-version.
    * Driver cost: the manifest file lists (file-count-bounded metadata).
    * Returns (files deleted, manifests dropped). */
  def vacuum(spark: SparkSession, baseDir: String,
      keepFrom: Int): (Int, Int) = {
    val fs = hadoopFs(spark, baseDir)
    val latest = latestVersion(spark, baseDir)
    require(keepFrom >= 1 && keepFrom <= latest,
      s"keepFrom=$keepFrom out of [1, $latest]")
    val kept = (keepFrom to latest)
      .flatMap(v => readManifest(fs, baseDir, v)).toSet
    val doomed = (listDataFiles(fs, baseDir) -- kept).toSeq.sorted
    doomed.foreach(f => fs.delete(new Path(dataDir(baseDir), f), false))
    // drop the now-unservable manifests AFTER the files: a crash between
    // the two leaves dangling manifests (readVersion fails loudly), never
    // a manifest silently missing data
    val dropped = (1 until keepFrom).count { v =>
      fs.delete(new Path(logDir(baseDir), s"$v.manifest"), false)
    }
    (doomed.size, dropped)
  }

  /** Targeted DELETE as a new version. Deleting keys not present commits
    * nothing and returns the current version (a recorded no-op would
    * carry an identical manifest — noise in the log). */
  def delete(spark: SparkSession, baseDir: String, keys: DataFrame,
      keyCol: String, partCol: String): Int = {
    val prev = latestVersion(spark, baseDir)
    require(prev >= 1, s"$baseDir has no commits — call init first")
    val base = readVersion(spark, baseDir, prev)
    val delKeys = keys.select(col(keyCol)).distinct().localCheckpoint()
    val affected = base.join(broadcast(delKeys), Seq(keyCol))
      .select(col(partCol)).distinct().collect().map(_.get(0)).toSeq
    Merge.requireNoNullPartition(affected, partCol)
    if (affected.isEmpty) prev
    else {
      val survivors = base.filter(col(partCol).isin(affected: _*))
        .join(broadcast(delKeys), Seq(keyCol), "left_anti")
        .localCheckpoint()
      commitRewrite(spark, baseDir, partCol, affected, prev, survivors)
    }
  }
}
