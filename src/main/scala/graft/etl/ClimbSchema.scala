package graft.etl

import org.apache.spark.sql.types._

/** Explicit schemas for the climbing-route data model (SURVEY.md §1;
  * selection set at reference export.py:38-65, extended fields per
  * examples/schema-extended.sql:13-16,24-27,49-51).
  *
  * Pinning an explicit StructType (instead of relying on JSON inference)
  * sidesteps the reference's schema-drift class of bugs — DuckDB inferred
  * sparse grade fields as JSON, forcing user-SQL CASTs (schema.sql:8-11);
  * here they are plain nullable strings and the CASTs become no-ops.
  */
object ClimbSchema {

  val grades: StructType = StructType(
    Seq("yds", "vscale", "french", "ewbank", "uiaa", "za", "british")
      .map(StructField(_, StringType, nullable = true)))

  val climbType: StructType = StructType(
    Seq("sport", "trad", "bouldering", "alpine", "tr", "mixed", "ice",
      "snow", "aid").map(StructField(_, BooleanType, nullable = true)))

  val metadata: StructType = StructType(Seq(
    StructField("lat", DoubleType, nullable = true),
    StructField("lng", DoubleType, nullable = true)))

  val content: StructType = StructType(
    Seq("description", "location", "protection")
      .map(StructField(_, StringType, nullable = true)))

  /** One climb record (the `climbs` table row type). */
  val climb: StructType = StructType(Seq(
    StructField("uuid", StringType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("fa", StringType, nullable = true),
    StructField("length", LongType, nullable = true),
    StructField("boltsCount", LongType, nullable = true),
    StructField("grades", grades, nullable = true),
    StructField("type", climbType, nullable = true),
    StructField("safety", StringType, nullable = true),
    StructField("metadata", metadata, nullable = true),
    StructField("content", content, nullable = true),
    StructField("pathTokens", ArrayType(StringType), nullable = true)))

  /** An area document carrying nested climbs (pre-enrichment input shape,
    * reference export.py:133-146): the area's pathTokens/metadata are the
    * parent values children may inherit. */
  val area: StructType = StructType(Seq(
    StructField("uuid", StringType, nullable = false),
    StructField("pathTokens", ArrayType(StringType), nullable = true),
    StructField("metadata", metadata, nullable = true),
    StructField("climbs", ArrayType(climb), nullable = true)))
}
