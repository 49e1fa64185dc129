package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
      // events.ts is canonicalized to TIMESTAMP (instant) whatever the
      // file says: the corpus has shipped as both TIMESTAMP(NANOS) and,
      // since a regeneration, naive TIMESTAMP_NTZ(MICROS). The engine's
      // event-time type is the instant TimestampType — Structured
      // Streaming watermarks and epoch arithmetic (unix_micros) require
      // it — and every graft session pins the UTC time zone
      // (GraftSession.engineConfs), so the NTZ→instant cast is
      // value-preserving and identical to DuckDB's naive reading.
      //
      // DELIBERATE session-wide mutation: nanosAsLong must outlive this
      // call because the parquet footer is re-converted at EXECUTION time
      // of the (lazy) plan — a scoped save/restore or per-read option
      // breaks the scan with PARQUET_TYPE_ILLEGAL once the flag is gone
      // (verified empirically; reader options are not consulted by the
      // task-side converter). Under µs files the flag is simply inert.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        // ns→µs truncation, the same DuckDB applies, so oracles match
        case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
        case _ => raw
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every table as a temp view (for the SQL entry points). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
