package graft.queries

import graft.Tables
import graft.multimodal.Multimodal

/** Driver-verified slice of the multimodal surface: the metadata-level
  * operators (resize-target planning, uniform frame sampling) are pure
  * column arithmetic over the deterministic synthetic media corpus, so
  * DuckDB reproduces them exactly — the decode/feature stubs stay
  * spec-tested (no codecs in this environment), but the Spark plumbing
  * around them is now oracle-checked end-to-end, not just unit-tested.
  */
object MultimodalQueries {

  /** The synthetic corpus in SQL: kind/width/height/n_frames are fixed
    * functions of doc_id (Multimodal.syntheticFromDocuments). */
  private val sqlKind =
    "CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"
  private val sqlW = "(doc_id % 64 + 16)"
  private val sqlH = "(doc_id % 48 + 12)"

  /** Resize-target planning (fit within 64px, never upscale). */
  val q55 = Q(
    "q55_media_resize",
    (spark, dir) => Multimodal.resizePlan(
      Multimodal.syntheticFromDocuments(Tables.load(spark, dir, "documents")),
      maxSide = 64),
    Some(s"""SELECT doc_id AS media_id, $sqlKind AS kind,
      CAST($sqlW AS INTEGER) AS width,
      CAST($sqlH AS INTEGER) AS height,
      CAST(FLOOR($sqlW * LEAST(1.0, 64.0 / GREATEST($sqlW, $sqlH))) AS INTEGER) AS target_width,
      CAST(FLOOR($sqlH * LEAST(1.0, 64.0 / GREATEST($sqlW, $sqlH))) AS INTEGER) AS target_height
    FROM documents""")
  )

  /** Uniform frame sampling: every 5th frame index of each video.
    * The API (`frameSamplePlan`) returns one array per video; the
    * driver-checked query EXPLODES it to (media_id, frame_idx) rows
    * because the verify harness sorts result cells with pandas, which
    * cannot order array values (round-2 q56 `err`). Every synthetic
    * video has ≥1 frame, so explode drops no media_ids here.
    */
  val q56 = Q(
    "q56_frame_sample",
    (spark, dir) => {
      import org.apache.spark.sql.functions.{col, explode}
      Multimodal.frameSamplePlan(
        Multimodal.syntheticFromDocuments(Tables.load(spark, dir, "documents")),
        everyN = 5)
        .select(col("media_id"), explode(col("frame_indices")).as("frame_idx"))
    },
    Some("""SELECT doc_id AS media_id,
      CAST(unnest(generate_series(0, doc_id % 30, 5)) AS INTEGER) AS frame_idx
    FROM documents WHERE doc_id % 3 = 2""")
  )

  val all: Seq[Q] = Seq(q55, q56)
}
