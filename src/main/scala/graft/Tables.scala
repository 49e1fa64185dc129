package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated synthetic corpus (TESTDATA.md).
  *
  * Tables: region nation customer supplier part orders lineitem events
  * documents embeddings — one parquet file per table under a scale-factor
  * directory (`/root/testdata/sf{0.001,0.01,0.1}`).
  *
  * At cluster scale each of these would be a multi-file partitioned dataset;
  * `spark.read.parquet(dir)` handles both layouts transparently, and all
  * downstream operators rely only on schema, never on file layout.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark does not read
      // natively: read the raw int64 nanos and truncate to microseconds —
      // the same ns→µs truncation DuckDB applies, so oracle values match.
      // DELIBERATE session-wide mutation: the flag must outlive this call
      // because the parquet footer is re-converted at EXECUTION time of the
      // (lazy) plan — a scoped save/restore or per-read option breaks the
      // scan with PARQUET_TYPE_ILLEGAL once the flag is gone (verified
      // empirically; reader options are not consulted by the task-side
      // converter). Effect of the flag elsewhere: TIMESTAMP(NANOS) columns
      // read as LONG nanos instead of failing outright, which is this
      // engine's intended semantics for any nanos column.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      if (raw.schema("ts").dataType == LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else raw
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every table as a temp view (for the SQL entry points). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
