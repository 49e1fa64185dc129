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

  def create(master: String = "local[*]",
      shufflePartitions: Int = 32,
      appName: String = "graft"): SparkSession = {
    val s = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // TypedImperativeAggregate (minhash/simhash) groups: the 128-group
      // default falls back to sort-based aggregation on any realistic
      // per-partition doc count; 64k groups ~ 25 MB of vote buffers —
      // hash aggregation stays on for the working range, the fallback
      // still guards runaway cardinality.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
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
    spark
  }

  /** Schema introspection (SURVEY.md §2.8 M1/M2): column names + types of
    * any result — the DESCRIBE surface the reference's converter uses. */
  def describe(df: DataFrame): Seq[(String, String)] =
    df.schema.fields.map(f => f.name -> f.dataType.simpleString).toSeq
}
