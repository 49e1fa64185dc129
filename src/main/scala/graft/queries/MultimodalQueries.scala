package graft.queries

import graft.Tables
import graft.multimodal.Multimodal
import graft.operators.Dedup

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

  // -- q73/q74: the REAL codec path, driver-checked -------------------------
  //
  // The corpus is Multimodal.syntheticPngCorpus: genuine PNG bytes encoded
  // on executors whose pixel content is the pure integer function
  // Multimodal.syntheticPixel. PNG is lossless, so the decode/extract
  // results are pure arithmetic over those pixels — the oracles below
  // recompute them WITHOUT any codec and embed the constants, making the
  // ImageIO decode and the block-mean embedding hash-checked end-to-end
  // (previously both were spec-only; see MultimodalSpec for the unit tier).

  private val nPng = 48

  /** Pure mirror of decodeImageIO's FNV-1a over ARGB bytes (alpha decodes
    * opaque 0xff for TYPE_INT_RGB-encoded PNGs), row-major, b/g/r/a per
    * pixel — byte-for-byte the executor loop, minus the codec. */
  private[graft] def mirrorChecksum(id: Long): Long = {
    val w = Multimodal.pngWidth(id)
    val h = Multimodal.pngHeight(id)
    var acc = 1469598103934665603L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = 0xff000000 | Multimodal.syntheticPixel(id, x, y)
        acc = (acc ^ (p & 0xff)) * 1099511628211L
        acc = (acc ^ ((p >>> 8) & 0xff)) * 1099511628211L
        acc = (acc ^ ((p >>> 16) & 0xff)) * 1099511628211L
        acc = (acc ^ ((p >>> 24) & 0xff)) * 1099511628211L
        x += 1
      }
      y += 1
    }
    acc
  }

  /** Pure mirror of featureExtractImage's block-mean RGB: builds the
    * synthetic image driver-side (setRGB from the shared pixel function —
    * no codec involved) and runs the SAME `Multimodal.blockMeanRGB` the
    * executor runs, so the arithmetic is single-sourced and cannot drift
    * from the oracle. Only the codec round-trip differs from the executor
    * path, and q73's checksum oracle pins that separately. */
  private[graft] def mirrorFeatures(id: Long, grid: Int = 2): Seq[Double] = {
    val w = Multimodal.pngWidth(id)
    val h = Multimodal.pngHeight(id)
    val im = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { im.setRGB(x, y, Multimodal.syntheticPixel(id, x, y)); x += 1 }
      y += 1
    }
    Multimodal.blockMeanRGB(im, grid).map(_.toDouble).toSeq
  }

  /** REAL ImageIO decode, driver-checked: decode the PNG corpus and emit
    * (media_id, width, height, n_pixels, checksum); the oracle is the
    * pure-arithmetic expectation as a VALUES relation. A broken codec
    * path (wrong dimensions, wrong pixels, dropped rows) hash-mismatches. */
  val q73 = Q(
    "q73_imageio_decode",
    (spark, dir) => {
      import org.apache.spark.sql.functions.col
      Multimodal.decodeImageIO(Multimodal.syntheticPngCorpus(spark, nPng))
        .toDF()
        .select(col("media_id"), col("width"), col("height"),
          col("n_pixels"), col("checksum"))
    },
    Some {
      val rows = (0L until nPng).map { id =>
        val w = Multimodal.pngWidth(id)
        val h = Multimodal.pngHeight(id)
        s"($id, $w, $h, ${w.toLong * h}, ${mirrorChecksum(id)})"
      }.mkString(", ")
      s"""SELECT CAST(media_id AS BIGINT) AS media_id,
        CAST(width AS INTEGER) AS width, CAST(height AS INTEGER) AS height,
        CAST(n_pixels AS BIGINT) AS n_pixels, CAST(checksum AS BIGINT) AS checksum
      FROM (VALUES $rows) AS t(media_id, width, height, n_pixels, checksum)"""
    }
  )

  /** The full decode→embed→similarity chain, driver-checked: block-mean
    * RGB embeddings from REAL decoded pixels, cosine-ranked against image
    * 0's embedding (supplied as plan constants from the pure mirror, the
    * queryVec pattern), top-5. Ranking runs over ROUNDED MICROS in both
    * engines (the q33 contract) so set membership and order never hinge on
    * last-ulp double drift; micro ties break on media_id. */
  val q74 = Q(
    "q74_media_embed_topk",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types.LongType
      val feats = Multimodal.featureExtractImage(
        Multimodal.syntheticPngCorpus(spark, nPng), grid = 2).toDF()
      feats.filter(col("media_id") =!= 0L)
        .select(col("media_id"),
          round(graft.operators.Similarity.cosineWithLit(
            col("features"), mirrorFeatures(0L)) * 1000000)
            .cast(LongType).as("cosine_1e6"))
        .select(
          row_number().over(
            Window.orderBy(col("cosine_1e6").desc, col("media_id"))).as("rank"),
          col("media_id"), col("cosine_1e6"))
        .filter(col("rank") <= 5)
    },
    Some {
      val vals = (0L until nPng).map { id =>
        s"($id, ${mirrorFeatures(id).map(_.toString).mkString("[", ", ", "]")})"
      }.mkString(", ")
      s"""WITH f AS (SELECT CAST(id AS BIGINT) AS media_id, v
               FROM (VALUES $vals) AS t(id, v)),
        q AS (SELECT v AS qv FROM f WHERE media_id = 0),
        pe AS (SELECT f.media_id, unnest(f.v) AS fv, unnest(q.qv) AS qvv
               FROM f, q WHERE f.media_id <> 0),
        cs AS (SELECT media_id, SUM(fv*qvv) AS dot,
                 SQRT(SUM(fv*fv)) AS nf, SQRT(SUM(qvv*qvv)) AS nq
               FROM pe GROUP BY 1),
        sm AS (SELECT media_id,
                 CAST(ROUND(dot/(nf*nq) * 1000000) AS BIGINT) AS cosine_1e6
               FROM cs)
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY cosine_1e6 DESC, media_id) AS INTEGER) AS rank,
             media_id, cosine_1e6
      FROM sm ORDER BY 1 LIMIT 5"""
    }
  )

  // -- q121: image near-dup (perceptual dHash + Hamming banding) ------------

  private val nDupBase = 40
  private val nDupDups = 12

  /** Driver-side mirror of a dup-corpus image's dHash: build the pixels
    * from the shared pure functions (no codec) and run the SAME
    * `Multimodal.dHash` the executor runs — single-sourced arithmetic,
    * the mirrorFeatures pattern. */
  private[graft] def mirrorDHash(id: Long): Long = {
    val base = if (id < nDupBase) id else id - nDupBase
    val w = Multimodal.dupPngWidth(base)
    val h = Multimodal.dupPngHeight(base)
    val im = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        im.setRGB(x, y,
          if (id < nDupBase) Multimodal.syntheticPixel(id, x, y)
          else Multimodal.dupPixel(base, x, y))
        x += 1
      }
      y += 1
    }
    Multimodal.dHash(im, grid = 8)
  }

  /** Image NEAR-dup detection on a planted-duplicate PNG corpus: REAL
    * ImageIO decode → perceptual dHash (integer-exact gradient bits) →
    * Hamming-banded candidate pairs → exact `bit_count(xor)` verify
    * ([[graft.operators.Dedup.hammingNearDupPairs]], lossless for
    * maxHamming < nBands). The planted dups are sparse pixel edits that
    * defeat byte-exact dedup but land within a few dHash bits; the
    * oracle recomputes every hash with pure arithmetic (driver-side
    * mirror of the same single-sourced dHash, q73's contract) and
    * brute-forces all pairs — equality proves both the codec path and
    * the banding's losslessness. */
  val q121 = Q(
    "q121_image_near_dups",
    (spark, dir) => {
      import org.apache.spark.sql.functions.col
      Dedup.hammingNearDupPairs(
        Multimodal.dHashImages(
          Multimodal.syntheticPngDupCorpus(spark, nDupBase, nDupDups), grid = 8),
        idCol = "media_id", sigCol = "dhash", maxHamming = 5, nBands = 8)
        .select(col("id_a").as("media_a"), col("id_b").as("media_b"),
          col("hamming"))
    },
    Some {
      val rows = (0L until (nDupBase + nDupDups)).map { id =>
        s"($id, ${mirrorDHash(id)})"
      }.mkString(", ")
      s"""WITH hs AS (SELECT CAST(id AS BIGINT) AS media_id, CAST(h AS BIGINT) AS dhash
               FROM (VALUES $rows) AS t(id, h))
      SELECT a.media_id AS media_a, b.media_id AS media_b,
        CAST(bit_count(xor(a.dhash, b.dhash)) AS INTEGER) AS hamming
      FROM hs a JOIN hs b ON a.media_id < b.media_id
      WHERE bit_count(xor(a.dhash, b.dhash)) <= 5"""
    }
  )

  val all: Seq[Q] = Seq(q55, q56, q73, q74, q121)
}
