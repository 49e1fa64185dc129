package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Area→climb un-nesting + parent-field inheritance (SURVEY.md §2.5 E1/E2;
  * reference export.py:133-146).
  *
  * The reference walks `area.climbs[]` in Python, copying the area's
  * pathTokens when a climb lacks them and the area's lat+lng (both together)
  * when the climb lacks lat. Spark-native: one `explode` (Generate) plus
  * `coalesce` projections — row-local, no shuffle, scales linearly.
  */
object Enrich {

  /** areas (ClimbSchema.area shape) → one row per climb, enriched. */
  def flattenAreas(areas: DataFrame): DataFrame =
    areas
      .select(col("pathTokens").as("_area_path"),
        col("metadata").as("_area_meta"),
        explode(col("climbs")).as("climb"))
      .select(
        col("climb.uuid").as("uuid"),
        col("climb.name").as("name"),
        col("climb.fa").as("fa"),
        col("climb.length").as("length"),
        col("climb.boltsCount").as("boltsCount"),
        col("climb.grades").as("grades"),
        col("climb.type").as("type"),
        col("climb.safety").as("safety"),
        // lat and lng are inherited together or not at all
        // (export.py:141-144 copies both under the single lat-missing check)
        when(col("climb.metadata.lat").isNull, col("_area_meta"))
          .otherwise(col("climb.metadata")).as("metadata"),
        col("climb.content").as("content"),
        coalesce(col("climb.pathTokens"), col("_area_path")).as("pathTokens"))
}
