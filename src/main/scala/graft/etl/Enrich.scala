package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Area→climb un-nesting + parent-field inheritance (SURVEY.md §2.5 E1/E2;
  * reference export.py:133-146).
  *
  * The reference walks `area.climbs[]` in Python with FALSY checks, which
  * the projections reproduce exactly:
  *  - pathTokens inherit when the climb's list is missing OR empty
  *    (`not climb.get("pathTokens")`), and the inherited value defaults to
  *    an empty list when the area has none (`area.get("pathTokens", [])`).
  *  - lat/lng inherit together iff the climb's lat is missing or 0.0
  *    (`not …get("lat")`) AND the area's lat is present and non-zero; a
  *    climb with no inheritable area keeps its own metadata untouched.
  * Spark-native: one `explode` (Generate) plus conditional projections —
  * row-local, no shuffle, scales linearly.
  */
object Enrich {

  private def latFalsy(lat: org.apache.spark.sql.Column) =
    lat.isNull || lat === 0.0

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
        // (export.py:141-144 copies both under the single lat-falsy check)
        when(latFalsy(col("climb.metadata.lat")) &&
            !latFalsy(col("_area_meta.lat")),
          struct(col("_area_meta.lat").as("lat"), col("_area_meta.lng").as("lng")))
          .otherwise(col("climb.metadata")).as("metadata"),
        col("climb.content").as("content"),
        when(col("climb.pathTokens").isNull || size(col("climb.pathTokens")) === 0,
          coalesce(col("_area_path"), array().cast("array<string>")))
          .otherwise(col("climb.pathTokens")).as("pathTokens"))
}
