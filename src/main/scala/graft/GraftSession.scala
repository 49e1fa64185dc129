package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.etl.SqlTransform
import graft.functions.GraftFunctions

/** One-stop session facade: a tuned local session factory plus the
  * registrations (tables as views, graft SQL functions, dialect shims)
  * that make the whole engine reachable from plain `spark.sql`.
  *
  * On a real cluster the builder settings change (no `master`, dynamic
  * allocation, larger shuffle partitions) but `prepare` is identical —
  * the SQL surface is deployment-agnostic.
  */
object GraftSession {

  /** Engine tuning every graft session applies (the CLI factory below and
    * the Bench/Verify harness mains, which build their own sessions):
    *
    *  - UTC + non-ANSI: DuckDB-oracle parity (out-of-range element_at /
    *    bad casts yield NULL, the reference's list_element semantics);
    *  - AQE on: runtime coalescing / skew handling;
    *  - objectHashAggregate fallback at 64k groups: the 128-group default
    *    pushes every TypedImperativeAggregate (minhash/simhash) into
    *    sort-based aggregation at any realistic per-partition doc count,
    *    while 64k groups of vote buffers is only ~25 MB — hash aggregation
    *    stays on for the working range and the fallback still guards
    *    runaway cardinality;
    *  - AQE coalesce floor at 64 KiB: the 1 MiB default collapses small
    *    CPU-BOUND stages (candidate joins over compact keys, e.g. dedup's
    *    prefix self-join: ~6 MiB of shuffle data but seconds of compute)
    *    to single-digit parallelism. The floor only matters when
    *    bytes/parallelism < 1 MiB — i.e. small stages; at cluster scale
    *    partitions dwarf both values and coalescing behaves as before.
    */
  val engineConfs: Map[String, String] = Map(
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.ansi.enabled" -> "false",
    "spark.sql.adaptive.enabled" -> "true",
    "spark.ui.enabled" -> "false",
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "65536",
    "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "64k",
    // merge-on-read scan splice ([[graft.plans.MorScanRewrite]]): the
    // tuned sessions read DV-bound / column-mapped versioned tables
    // through the native codegen plan instead of the V1 Row fallback
    "spark.graft.mor.rewrite" -> "true")

  /** `builder.config(k, v)` for every [[engineConfs]] entry. */
  def tuned(builder: SparkSession.Builder): SparkSession.Builder =
    engineConfs.foldLeft(builder) { case (b, (k, v)) => b.config(k, v) }

  def create(master: String = "local[*]",
      shufflePartitions: Int = 32,
      appName: String = "graft"): SparkSession = {
    val s = tuned(SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Register the synthetic-corpus tables as views plus all graft SQL
    * functions (vec_dot/vec_cosine/vec_norm, list_element) on an existing
    * session. After this, every operator is usable from spark.sql. */
  def prepare(spark: SparkSession, dataDir: String): SparkSession = {
    Tables.registerAll(spark, dataDir)
    GraftFunctions.register(spark)
    SqlTransform.registerDialect(spark)
    installOptimizations(spark)
    spark
  }

  /** Install graft's optimizer rules on an EXISTING session (the
    * imperative twin of the `graft.GraftExtensions` injection):
    * currently the lossless Levenshtein length-bound prefilter. Guarded
    * against double-install, so every entry path may call it. */
  def installOptimizations(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.LevenshteinPrefilter)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+
          graft.plans.LevenshteinPrefilter
    }
    // the merge-on-read scan splice (gated on spark.graft.mor.rewrite,
    // which the tuned sessions set — see MorScanRewrite's scaladoc)
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.MorScanRewrite)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+
          graft.plans.MorScanRewrite
    }
  }

  /** Schema introspection (SURVEY.md §2.8 M1/M2): column names + types of
    * any result — the DESCRIBE surface the reference's converter uses. */
  def describe(df: DataFrame): Seq[(String, String)] =
    df.schema.fields.map(f => f.name -> f.dataType.simpleString).toSeq

  // ---------------------------------------------------------------------
  // NAME-ADDRESSED TABLES — a session-level name → path registry, the
  // minimal catalog seam: consumers say `graft.orders_gold` (SQL) or
  // `.option("table", "orders_gold")` (reader/writer/stream) instead
  // of restating absolute paths everywhere. Deliberately NOT a Spark
  // TableCatalog: the tables stay path-addressed underneath (the
  // Delta-on-paths convention); this only removes the path restating.
  // Keyed per session UUID so two sessions' registries never collide.
  // ---------------------------------------------------------------------

  private val tableRegistry =
    scala.collection.concurrent.TrieMap.empty[(String, String), String]

  /** A stable per-session key (identity hash — sessions are long-lived
    * JVM objects; cloned sessions get their own registries). */
  private def sessionKey(spark: SparkSession): String =
    System.identityHashCode(spark).toHexString

  /** Bind `name` to a versioned table's base path for this session.
    * Re-registering a name rebinds it (latest wins, like temp views). */
  def registerTable(spark: SparkSession, name: String,
      path: String): Unit = {
    require(name.nonEmpty && !name.contains('/'),
      s"table name must be a bare identifier, got '$name'")
    tableRegistry.put((sessionKey(spark), name.toLowerCase), path)
  }

  /** The path `name` is bound to in this session, if any. */
  def tablePath(spark: SparkSession, name: String): Option[String] =
    tableRegistry.get((sessionKey(spark), name.toLowerCase))

  /** Names registered in this session (for error listings). */
  def registeredTables(spark: SparkSession): Seq[String] =
    tableRegistry.keys.collect {
      case (s, n) if s == sessionKey(spark) => n }.toSeq.sorted

  /** Resolve a `graft.<x>` operand: an absolute path passes through;
    * a bare identifier looks up the session registry, refusing loudly
    * with the registered names when unbound. */
  def resolveTable(spark: SparkSession, x: String): String =
    if (x.contains('/')) x
    else tablePath(spark, x).getOrElse(
      throw new IllegalArgumentException(
        s"no registered graft table named '$x' " +
          s"(registered: ${registeredTables(spark).mkString(", ")}) — " +
          "bind it with GraftSession.registerTable(spark, name, path) " +
          "or address the table by absolute path: graft.`/abs/path`"))
}
