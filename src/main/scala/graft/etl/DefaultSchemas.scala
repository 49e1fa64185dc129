package graft.etl

/** Built-in schema-SQL texts reproducing the reference's output contracts
  * (the canonical 22-column transform of schema.sql:4-38 and the example
  * variants). Users supply their own SQL the same way the reference's
  * README documents (README.md:77-98); these are the stock shapes. */
object DefaultSchemas {

  /** Canonical 22-column output (SURVEY.md §1 "canonical output record"). */
  val canonical: String = """
    SELECT
      uuid                              AS climb_id,
      name                              AS climb_name,
      CAST(grades.yds AS VARCHAR)       AS grade_yds,
      CAST(grades.vscale AS VARCHAR)    AS grade_vscale,
      CAST(grades.french AS VARCHAR)    AS grade_french,
      type.sport                        AS is_sport,
      type.trad                         AS is_trad,
      type.bouldering                   AS is_boulder,
      type.alpine                       AS is_alpine,
      type.tr                           AS is_top_rope,
      list_element(pathTokens, 1)       AS country,
      list_element(pathTokens, 2)       AS state_province,
      list_element(pathTokens, 3)       AS region,
      list_element(pathTokens, 4)       AS area,
      list_element(pathTokens, 5)       AS crag,
      metadata.lat                      AS latitude,
      metadata.lng                      AS longitude,
      length                            AS length_meters,
      boltsCount                        AS bolts_count,
      fa                                AS first_ascent,
      CAST(safety AS VARCHAR)           AS safety,
      content.description               AS description
    FROM climbs
  """

  /** Minimal 7-column projection with coordinate NOT NULL filter
    * (examples/schema-minimal.sql behavior). */
  val minimal: String = """
    SELECT
      uuid                                   AS climb_id,
      COALESCE(name, '')                     AS climb_name,
      COALESCE(CAST(grades.yds AS VARCHAR),
               CAST(grades.vscale AS VARCHAR), '') AS grade,
      COALESCE(type.sport, false)            AS is_sport,
      COALESCE(metadata.lat, 0.0)            AS latitude,
      COALESCE(metadata.lng, 0.0)            AS longitude,
      COALESCE(length, 0)                    AS length_meters
    FROM climbs
    WHERE metadata.lat IS NOT NULL AND metadata.lng IS NOT NULL
  """

  /** Extended 34-column output: every grade system / type flag, 6 path
    * levels, the whole-array pathTokens passthrough (P4), and the extra
    * content fields (examples/schema-extended.sql:4-53 behavior). */
  val extended: String = """
    SELECT
      uuid AS climb_id,
      name AS climb_name,
      COALESCE(CAST(grades.yds AS VARCHAR), '') AS grade_yds,
      COALESCE(CAST(grades.vscale AS VARCHAR), '') AS grade_vscale,
      COALESCE(CAST(grades.french AS VARCHAR), '') AS grade_french,
      COALESCE(CAST(grades.ewbank AS VARCHAR), '') AS grade_ewbank,
      COALESCE(CAST(grades.uiaa AS VARCHAR), '') AS grade_uiaa,
      COALESCE(CAST(grades.za AS VARCHAR), '') AS grade_za,
      COALESCE(CAST(grades.british AS VARCHAR), '') AS grade_british,
      COALESCE(type.sport, false) AS is_sport,
      COALESCE(type.trad, false) AS is_trad,
      COALESCE(type.bouldering, false) AS is_boulder,
      COALESCE(type.alpine, false) AS is_alpine,
      COALESCE(type.tr, false) AS is_top_rope,
      COALESCE(type.mixed, false) AS is_mixed,
      COALESCE(type.ice, false) AS is_ice,
      COALESCE(type.snow, false) AS is_snow,
      COALESCE(type.aid, false) AS is_aid,
      COALESCE(list_element(pathTokens, 1), '') AS country,
      COALESCE(list_element(pathTokens, 2), '') AS state_province,
      COALESCE(list_element(pathTokens, 3), '') AS region,
      COALESCE(list_element(pathTokens, 4), '') AS area,
      COALESCE(list_element(pathTokens, 5), '') AS crag,
      COALESCE(list_element(pathTokens, 6), '') AS sub_area,
      pathTokens AS full_location_path,
      COALESCE(metadata.lat, 0.0) AS latitude,
      COALESCE(metadata.lng, 0.0) AS longitude,
      COALESCE(length, 0) AS length_meters,
      COALESCE(boltsCount, 0) AS bolts_count,
      COALESCE(fa, '') AS first_ascent,
      COALESCE(CAST(safety AS VARCHAR), '') AS safety,
      COALESCE(content.description, '') AS description,
      COALESCE(content.location, '') AS location_description,
      COALESCE(content.protection, '') AS protection
    FROM climbs
  """

  /** USA sport-only projection + conjunctive filter
    * (examples/schema-usa-sport-only.sql behavior). */
  val usaSportOnly: String = """
    SELECT
      uuid                              AS climb_id,
      name                              AS climb_name,
      CAST(grades.yds AS VARCHAR)       AS grade_yds,
      list_element(pathTokens, 2)       AS state_province,
      list_element(pathTokens, 4)       AS area,
      metadata.lat                      AS latitude,
      metadata.lng                      AS longitude,
      length                            AS length_meters,
      boltsCount                        AS bolts_count,
      safety                            AS safety
    FROM climbs
    WHERE list_element(pathTokens, 1) = 'USA'
      AND type.sport = true
      AND metadata.lat IS NOT NULL
      AND metadata.lng IS NOT NULL
  """
}
