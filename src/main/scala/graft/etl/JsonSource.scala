package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON ingestion (SURVEY.md §2.1 S3). The reference hands records to its
  * engine as one JSON *array* written to a temp file and re-inferred
  * (export.py:216-228); the Spark-native equivalents are:
  *
  *  - [[readArrayFile]]: `multiLine` JSON-array file — schema pinned by
  *    default, inference on request (matching read_json_auto).
  *  - [[readJsonl]]: JSON-lines — the layout to prefer at scale (splittable,
  *    so a 100 TB input parallelizes; a multiLine array file does not).
  *  - [[fromRecords]]: in-memory record strings (e.g. straight from the
  *    fetch client) — no temp-file handoff at all.
  */
object JsonSource {

  def readArrayFile(spark: SparkSession, path: String,
      schema: Option[StructType] = Some(ClimbSchema.climb)): DataFrame = {
    val r = spark.read.option("multiLine", "true")
    schema.fold(r)(r.schema).json(path)
  }

  def readJsonl(spark: SparkSession, path: String,
      schema: Option[StructType] = Some(ClimbSchema.climb)): DataFrame = {
    val r = spark.read
    schema.fold(r)(r.schema).json(path)
  }

  /** Parse records already in memory (driver-side fetch path): distributes
    * the strings, then parses as JSON on executors. */
  def fromRecords(spark: SparkSession, records: Seq[String],
      schema: StructType = ClimbSchema.climb): DataFrame = {
    import spark.implicits._
    spark.read.schema(schema).json(records.toDS())
  }

  /** Register as the `climbs` view the user SQL runs over. */
  def registerClimbs(df: DataFrame): DataFrame = {
    df.createOrReplaceTempView("climbs")
    df
  }
}
