package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata.
  *
  * Two decoders share one interface: [[decodeImageIO]] decodes REAL image
  * bytes through the JDK's ImageIO (PNG/JPEG/BMP/GIF — no external codec
  * needed), proving a real codec drops into the plumbing unchanged;
  * [[decodeStub]] parses the synthetic corpus' deterministic fake headers
  * (its payloads are text bytes, not decodable media). Everything around
  * them — the schema, the per-partition batched processing shape,
  * partition sizing, and the feature-vector contract — is identical: a
  * production decoder (JNI video codec, audio resampler) swaps in the
  * same way ImageIO does.
  *
  * Processing uses Dataset.mapPartitions so the (expensive) decoder
  * amortizes any per-batch init across a whole partition — the same
  * batching rationale as Arrow-batched UDFs — and stays embarrassingly
  * parallel: no shuffle anywhere in decode/feature-extract.
  */
object Multimodal {

  /** media(id, kind, payload, meta) — kind ∈ {image, audio, video}. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true))),
      nullable = true)))

  final case class MediaMeta(width: Option[Int], height: Option[Int],
    n_frames: Option[Int], sample_rate: Option[Int])
  final case class Media(media_id: Long, kind: String, payload: Array[Byte],
    meta: MediaMeta)
  final case class Decoded(media_id: Long, kind: String, width: Int,
    height: Int, n_pixels: Long, checksum: Long)
  final case class MediaFeatures(media_id: Long, features: Array[Float])

  /** Deterministic fake media corpus derived from the documents table:
    * payload = a fake header (width/height/frames derived from doc_id) +
    * the text bytes. Stands in for real image bytes end-to-end. */
  def syntheticFromDocuments(docs: DataFrame): DataFrame = {
    val kinds = array(lit("image"), lit("audio"), lit("video"))
    docs.select(
      col("doc_id").as("media_id"),
      element_at(kinds, (col("doc_id") % 3 + 1).cast(IntegerType)).as("kind"),
      col("text").cast(BinaryType).as("payload"),
      struct(
        (col("doc_id") % 64 + 16).cast(IntegerType).as("width"),
        (col("doc_id") % 48 + 12).cast(IntegerType).as("height"),
        (col("doc_id") % 30 + 1).cast(IntegerType).as("n_frames"),
        lit(16000).as("sample_rate")).as("meta"))
  }

  /** The deterministic pixel function shared by [[syntheticPngCorpus]] and
    * the oracle mirrors in graft.queries: 24-bit RGB at (x, y) for image
    * `seed`. Pure integer arithmetic — reproducible anywhere without a
    * codec, which is what lets a DuckDB oracle hash-check the REAL decode
    * path's output. */
  def syntheticPixel(seed: Long, x: Int, y: Int): Int =
    ((seed * 2654435761L).toInt + x * 31 + y * 7) & 0xffffff

  /** Dimensions of synthetic PNG `id` (tiny, varied, never degenerate). */
  def pngWidth(id: Long): Int = (id % 7 + 3).toInt
  def pngHeight(id: Long): Int = (id % 5 + 2).toInt

  /** A corpus of n REAL PNG images: payload bytes are produced by the
    * JDK's PNG encoder on executors, pixel content = [[syntheticPixel]].
    * PNG is lossless 24-bit RGB, so whatever decoder reads the payload
    * back must reproduce those exact pixels — the bridge that lets the
    * driver's oracle check [[decodeImageIO]] against pure-arithmetic
    * constants. Encoding is row-local (no shuffle); at scale this stands
    * in for a parquet scan of a binary image column. */
  def syntheticPngCorpus(spark: SparkSession, n: Int): Dataset[Media] = {
    import spark.implicits._
    spark.range(n).map { boxed =>
      val id = boxed.toLong
      val w = pngWidth(id)
      val h = pngHeight(id)
      val im = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { im.setRGB(x, y, syntheticPixel(id, x, y)); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", bos)
      Media(id, "image", bos.toByteArray, MediaMeta(None, None, None, None))
    }
  }

  /** STUB decoder: a real implementation would parse the codec header and
    * return pixel data; this derives the same shape deterministically from
    * the payload bytes. Runs per-partition so decoder init is amortized. */
  def decodeStub(media: Dataset[Media]): Dataset[Decoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init lives here (real codec: allocate decoder once)
      it.map { m =>
        val w = m.meta.width.getOrElse(0)
        val h = m.meta.height.getOrElse(0)
        val bytes = if (m.payload == null) Array.emptyByteArray else m.payload
        val checksum = bytes.foldLeft(1469598103934665603L)(
          (acc, b) => (acc ^ b) * 1099511628211L) // FNV-1a, deterministic
        Decoded(m.media_id, m.kind, w, h, w.toLong * h, checksum)
      }
    }
  }

  /** REAL image decoder over the same interface as [[decodeStub]]: parses
    * the payload bytes with the JDK's ImageIO (PNG/JPEG/BMP/GIF),
    * returning actual pixel dimensions and an FNV-1a checksum over the
    * decoded ARGB pixels — content-addressable evidence the pixels, not
    * just the container bytes, were read. Runs per-partition with decoder
    * init (disabling ImageIO's temp-file cache) amortized across the
    * partition, exactly like a JNI codec would be. Rows whose payload
    * doesn't decode are dropped — the production contract for a corpus
    * with corrupt members (a real pipeline would also side-channel a
    * corrupt-count metric). */
  def decodeImageIO(media: Dataset[Media]): Dataset[Decoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init: no temp-file cache, in-memory streams
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { m =>
        val bytes = if (m.payload == null) Array.emptyByteArray else m.payload
        val img =
          try Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes)))
          catch { case _: java.io.IOException => None }
        img.map { im =>
          val w = im.getWidth
          val h = im.getHeight
          var acc = 1469598103934665603L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = im.getRGB(x, y)
              acc = (acc ^ (p & 0xff)) * 1099511628211L
              acc = (acc ^ ((p >>> 8) & 0xff)) * 1099511628211L
              acc = (acc ^ ((p >>> 16) & 0xff)) * 1099511628211L
              acc = (acc ^ ((p >>> 24) & 0xff)) * 1099511628211L
              x += 1
            }
            y += 1
          }
          Decoded(m.media_id, m.kind, w, h, w.toLong * h, acc)
        }
      }
    }
  }

  /** [[decodeImageIO]] with the corrupt-row SIDE CHANNEL its scaladoc
    * promises: undecodable rows are still dropped from the relation, but
    * each drop bumps a named LongAccumulator the driver reads after any
    * action — the operational metric that distinguishes "corpus is 2%
    * corrupt" from silent data loss. Standard accumulator semantics:
    * counts are at-least-once under task retries/speculation (fine for a
    * health metric; an exactly-once count is a separate aggregation
    * query). */
  def decodeImageIOWithMetrics(media: Dataset[Media])
      : (Dataset[Decoded], org.apache.spark.util.LongAccumulator) = {
    import media.sparkSession.implicits._
    val corrupt = media.sparkSession.sparkContext
      .longAccumulator("graft.multimodal.corrupt_media")
    val ds = media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { m =>
        val bytes = if (m.payload == null) Array.emptyByteArray else m.payload
        val img =
          try Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes)))
          catch { case _: java.io.IOException => None }
        if (img.isEmpty) corrupt.add(1)
        img.map { im =>
          val w = im.getWidth
          val h = im.getHeight
          var acc = 1469598103934665603L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = im.getRGB(x, y)
              acc = (acc ^ (p & 0xff)) * 1099511628211L
              acc = (acc ^ ((p >>> 8) & 0xff)) * 1099511628211L
              acc = (acc ^ ((p >>> 16) & 0xff)) * 1099511628211L
              acc = (acc ^ ((p >>> 24) & 0xff)) * 1099511628211L
              x += 1
            }
            y += 1
          }
          Decoded(m.media_id, m.kind, w, h, w.toLong * h, acc)
        }
      }
    }
    (ds, corrupt)
  }

  /** REAL image feature extractor over DECODED PIXELS: a grid×grid
    * block-mean RGB vector (row-major blocks, channels r/g/b per block,
    * means scaled to [0,1]) — dim = grid²·3. No ML dependency, but a
    * genuine content embedding: visually similar images land near each
    * other in cosine space, and the decode→embed→similarity chain is real
    * end-to-end. Channel sums are INTEGER (exact, order-independent) with
    * one final divide, so the vector is bit-reproducible from the pixel
    * values alone — which is what lets an oracle recompute it without a
    * codec. Same per-partition batching as [[decodeImageIO]]; undecodable
    * rows are dropped. */
  def featureExtractImage(media: Dataset[Media], grid: Int = 2): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { m =>
        val bytes = if (m.payload == null) Array.emptyByteArray else m.payload
        val img =
          try Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes)))
          catch { case _: java.io.IOException => None }
        img.map(im => MediaFeatures(m.media_id, blockMeanRGB(im, grid)))
      }
    }
  }

  /** The block-mean arithmetic of [[featureExtractImage]], exposed so
    * specs/oracles can mirror it: pixel (x, y) belongs to block
    * (min(x·g/w, g−1), min(y·g/h, g−1)). */
  def blockMeanRGB(im: java.awt.image.BufferedImage, grid: Int): Array[Float] = {
    val w = im.getWidth
    val h = im.getHeight
    val sums = Array.ofDim[Long](grid * grid * 3)
    val counts = Array.ofDim[Long](grid * grid)
    var y = 0
    while (y < h) {
      val by = math.min(y * grid / h, grid - 1)
      var x = 0
      while (x < w) {
        val bx = math.min(x * grid / w, grid - 1)
        val b = by * grid + bx
        val p = im.getRGB(x, y)
        sums(b * 3) += (p >>> 16) & 0xff
        sums(b * 3 + 1) += (p >>> 8) & 0xff
        sums(b * 3 + 2) += p & 0xff
        counts(b) += 1
        x += 1
      }
      y += 1
    }
    val v = Array.ofDim[Float](grid * grid * 3)
    var i = 0
    while (i < v.length) {
      val c = counts(i / 3)
      v(i) = if (c == 0) 0f else (sums(i).toDouble / (c * 255.0)).toFloat
      i += 1
    }
    v
  }

  /** STUB feature extractor: real impl = CNN/audio embedding; this derives
    * a deterministic `dim`-float vector from the payload checksum. The
    * output contract (media_id, ArrayType(FloatType)) feeds directly into
    * graft.operators.Similarity. */
  def featureExtractStub(media: Dataset[Media], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val bytes = if (m.payload == null) Array.emptyByteArray else m.payload
        var s = bytes.foldLeft(-3750763034362895579L)(
          (acc, b) => (acc ^ b) * 1099511628211L)
        val v = Array.ofDim[Float](dim)
        var i = 0
        while (i < dim) {
          s = s * 6364136223846793005L + 1442695040888963407L // LCG step
          v(i) = ((s >>> 40).toInt.toFloat / (1 << 23)) - 1.0f
          i += 1
        }
        MediaFeatures(m.media_id, v)
      }
    }
  }

  /** Perceptual dHash over decoded pixels: grayscale block means on a
    * (grid+1)×grid grid (so horizontally adjacent blocks overlap nothing
    * and every row yields `grid` comparisons), bit (bx, by) set iff the
    * left block is strictly brighter than its right neighbor. Bit index =
    * by·grid+bx, row-major — 64 bits at the default grid 8.
    *
    * The whole contract is INTEGER: per-block sums of the BT.601-weighted
    * gray 299r+587g+114b, and the brightness comparison runs on exact
    * cross-products (sumL·cntR > sumR·cntL) instead of dividing — no
    * float anywhere, so a pure-arithmetic oracle reproduces every bit.
    * Brightness shifts move both sides of each comparison together, which
    * is what makes dHash robust to the re-encode/brightness edits that
    * break exact byte dedup (q23's md5) on images. Degenerate inputs
    * (width < grid+1 or height < grid) leave empty blocks whose
    * comparisons are all-false rather than erroring. */
  def dHash(im: java.awt.image.BufferedImage, grid: Int = 8): Long = {
    val w = im.getWidth
    val h = im.getHeight
    val cols = grid + 1
    val sums = Array.ofDim[Long](cols * grid)
    val counts = Array.ofDim[Long](cols * grid)
    var y = 0
    while (y < h) {
      val by = math.min(y * grid / h, grid - 1)
      var x = 0
      while (x < w) {
        val bx = math.min(x * cols / w, cols - 1)
        val p = im.getRGB(x, y)
        val gray = 299L * ((p >>> 16) & 0xff) + 587L * ((p >>> 8) & 0xff) +
          114L * (p & 0xff)
        sums(by * cols + bx) += gray
        counts(by * cols + bx) += 1
        x += 1
      }
      y += 1
    }
    var bits = 0L
    var by = 0
    while (by < grid) {
      var bx = 0
      while (bx < grid) {
        val l = by * cols + bx
        val r = l + 1
        if (sums(l) * counts(r) > sums(r) * counts(l))
          bits |= 1L << (by * grid + bx)
        bx += 1
      }
      by += 1
    }
    bits
  }

  /** (media_id, dhash) via the REAL ImageIO decode path — the same
    * per-partition batching and drop-undecodable contract as
    * [[decodeImageIO]]; row-local, no shuffle. */
  def dHashImages(media: Dataset[Media], grid: Int = 8): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { m =>
        val bytes = if (m.payload == null) Array.emptyByteArray else m.payload
        val img =
          try Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes)))
          catch { case _: java.io.IOException => None }
        img.map(im => (m.media_id, dHash(im, grid)))
      }
    }.toDF("media_id", "dhash")
  }

  /** Pixel function of near-duplicate `base`: the base image with a
    * sparse deterministic edit — every ~29th pixel gets two red bits
    * flipped (XOR keeps it pure integer arithmetic, no clamping). Sparse
    * enough that block means move only slightly (small dHash Hamming
    * distance), but every payload byte run differs (exact dedup misses
    * it). */
  def dupPixel(base: Long, x: Int, y: Int): Int = {
    val p = syntheticPixel(base, x, y)
    if ((x * 7 + y * 11) % 29 == 0) p ^ 0x180000 else p
  }

  /** Dimensions of the dup-corpus images — larger than
    * [[syntheticPngCorpus]]'s so every (grid+1)×grid dHash block is
    * populated at grid 8. */
  def dupPngWidth(id: Long): Int = (id % 8 + 18).toInt
  def dupPngHeight(id: Long): Int = (id % 6 + 12).toInt

  /** PNG corpus with PLANTED NEAR-DUPLICATES: ids [0, nBase) are base
    * images (pixel content [[syntheticPixel]], dims [[dupPngWidth]]×
    * [[dupPngHeight]]); ids [nBase, nBase+nDups) are [[dupPixel]] edits
    * of base (id − nBase) at the same dimensions. Same executor-side PNG
    * encoding as [[syntheticPngCorpus]]. */
  def syntheticPngDupCorpus(spark: SparkSession, nBase: Int,
      nDups: Int): Dataset[Media] = {
    import spark.implicits._
    require(nDups <= nBase, s"nDups=$nDups > nBase=$nBase")
    spark.range(nBase + nDups).map { boxed =>
      val id = boxed.toLong
      val base = if (id < nBase) id else id - nBase
      val w = dupPngWidth(base)
      val h = dupPngHeight(base)
      val im = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          im.setRGB(x, y,
            if (id < nBase) syntheticPixel(id, x, y) else dupPixel(base, x, y))
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", bos)
      Media(id, "image", bos.toByteArray, MediaMeta(None, None, None, None))
    }
  }

  /** Metadata-level ops (no payload decode needed): resize target
    * bookkeeping and uniform frame sampling — pure column arithmetic,
    * fully codegen'd. */
  def resizePlan(media: DataFrame, maxSide: Int): DataFrame = {
    val w = col("meta.width")
    val h = col("meta.height")
    val scale = least(lit(1.0), lit(maxSide) / greatest(w, h).cast(DoubleType))
    media.select(col("media_id"), col("kind"),
      w.as("width"), h.as("height"),
      floor(w * scale).cast(IntegerType).as("target_width"),
      floor(h * scale).cast(IntegerType).as("target_height"))
  }

  def frameSamplePlan(media: DataFrame, everyN: Int): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"),
        // zero-frame (or null-meta) videos yield an empty list; a bare
        // sequence(0, -1, step) would throw on illegal bounds
        when(coalesce(col("meta.n_frames"), lit(0)) < 1,
          array().cast(ArrayType(IntegerType)))
          .otherwise(sequence(lit(0), col("meta.n_frames") - 1, lit(everyN)))
          .as("frame_indices"))
}
