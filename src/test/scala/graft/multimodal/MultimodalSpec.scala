package graft.multimodal

import graft.{SparkSpec, Tables}
import graft.operators.Dedup

/** Multimodal plumbing: schema, batched decode shape, determinism. */
class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  private lazy val media =
    Multimodal.syntheticFromDocuments(Tables.load(spark, sf, "documents"))

  test("synthetic media matches the declared binary-column schema") {
    // names + types are the contract; nullability differs by construction
    assert(media.schema.simpleString === Multimodal.mediaSchema.simpleString)
    assert(media.count() > 0)
    assert(media.select("kind").distinct().collect().map(_.getString(0)).toSet
      .subsetOf(Set("image", "audio", "video")))
  }

  test("stub decoder: per-partition batch shape, deterministic checksums") {
    val ds = media.as[Multimodal.Media]
    val a = Multimodal.decodeStub(ds).collect().map(d => d.media_id -> d).toMap
    val b = Multimodal.decodeStub(ds).collect().map(d => d.media_id -> d).toMap
    assert(a.keySet === b.keySet)
    a.foreach { case (id, d) =>
      assert(d.checksum === b(id).checksum)
      assert(d.n_pixels === d.width.toLong * d.height)
    }
  }

  test("ImageIO decoder reads REAL png bytes through the same interface") {
    // tiny real PNGs generated in-memory: the decode path runs an actual
    // codec end-to-end — dimensions and pixels come from the image, not
    // the metadata struct (which is deliberately wrong here)
    def png(w: Int, h: Int, seed: Int): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        im.setRGB(x, y, (seed * 2654435761L).toInt + x * 31 + y * 7)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", bos)
      bos.toByteArray
    }
    val rows = Seq(
      Multimodal.Media(1L, "image", png(5, 3, 1),
        Multimodal.MediaMeta(Some(999), Some(999), None, None)),
      Multimodal.Media(2L, "image", png(5, 3, 1),   // identical pixels to 1
        Multimodal.MediaMeta(None, None, None, None)),
      Multimodal.Media(3L, "image", png(4, 7, 2),
        Multimodal.MediaMeta(None, None, None, None)),
      Multimodal.Media(4L, "image", "not an image".getBytes, // corrupt: dropped
        Multimodal.MediaMeta(Some(1), Some(1), None, None)))
    val out = Multimodal.decodeImageIO(rows.toDS().repartition(2))
      .collect().map(d => d.media_id -> d).toMap
    assert(out.keySet === Set(1L, 2L, 3L))         // corrupt row dropped
    assert(out(1L).width === 5 && out(1L).height === 3 && out(1L).n_pixels === 15L)
    assert(out(3L).width === 4 && out(3L).height === 7)
    assert(out(1L).checksum === out(2L).checksum)  // pixel-content-addressed
    assert(out(1L).checksum !== out(3L).checksum)
  }

  test("synthetic PNG corpus: decode + block-mean features match the pure mirrors") {
    import graft.queries.MultimodalQueries
    val media = Multimodal.syntheticPngCorpus(spark, 12)
    // the decode path reads real PNG bytes; the mirror never touches a
    // codec — agreement proves the encode→decode round trip is lossless
    // and the checksum walks the pixels the oracle thinks it walks
    val dec = Multimodal.decodeImageIO(media).collect()
      .map(d => d.media_id -> d).toMap
    assert(dec.keySet === (0L until 12).toSet)
    dec.foreach { case (id, d) =>
      assert(d.width === Multimodal.pngWidth(id) && d.height === Multimodal.pngHeight(id))
      assert(d.checksum === MultimodalQueries.mirrorChecksum(id), s"media $id")
    }
    val feats = Multimodal.featureExtractImage(media, grid = 2).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    assert(feats.keySet === (0L until 12).toSet)
    feats.foreach { case (id, v) =>
      assert(v.map(_.toDouble) === MultimodalQueries.mirrorFeatures(id), s"media $id")
    }
  }

  test("stub feature extractor emits fixed-dim float vectors usable by Similarity") {
    val feats = Multimodal.featureExtractStub(media.as[Multimodal.Media], dim = 16)
    val rows = feats.collect()
    assert(rows.forall(_.features.length === 16))
    // deterministic + non-constant
    assert(rows.map(_.features.toSeq).distinct.length > 1)
  }

  test("resize plan caps the long side and preserves orientation") {
    val plan = Multimodal.resizePlan(media, maxSide = 32).collect()
    plan.foreach { r =>
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      val (tw, th) = (r.getAs[Int]("target_width"), r.getAs[Int]("target_height"))
      assert(tw <= 32 && th <= 32)
      assert((w >= h) === (tw >= th))
    }
  }

  test("dHash: brightness-shift invariant, sensitive to structure, " +
      "decode path matches the pure mirror") {
    def img(w: Int, h: Int, px: (Int, Int) => Int) = {
      val im = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, px(x, y))
      im
    }
    def px(x: Int, y: Int) = Multimodal.syntheticPixel(99L, x, y)
    val base = Multimodal.dHash(img(20, 14, px))
    // uniform brightness shift moves both sides of every block comparison
    // together: hash unchanged (what byte-exact dedup can never give)
    def brighter(x: Int, y: Int) = {
      val p = px(x, y)
      def lift(c: Int) = math.min(255, c + 40)
      (lift((p >>> 16) & 0xff) << 16) | (lift((p >>> 8) & 0xff) << 8) | lift(p & 0xff)
    }
    assert(Multimodal.dHash(img(20, 14, brighter)) === base)
    // structural change (transpose-ish reshuffle) moves many bits
    val other = Multimodal.dHash(img(20, 14, (x, y) => px(y % 20, x % 14)))
    assert(java.lang.Long.bitCount(base ^ other) > 10)
    // executor decode path = driver mirror, image by image (q121's corpus
    // shape, whose mirror splits base/dup at id 40)
    val decoded = Multimodal.dHashImages(
      Multimodal.syntheticPngDupCorpus(spark, nBase = 40, nDups = 12), grid = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(decoded.size === 52)
    decoded.foreach { case (id, h) =>
      assert(h === graft.queries.MultimodalQueries.mirrorDHash(id))
    }
  }

  test("hamming-banded image near-dups: lossless vs brute force, planted " +
      "dups all found") {
    import org.apache.spark.sql.functions.col
    val sigs = Multimodal.dHashImages(
      Multimodal.syntheticPngDupCorpus(spark, nBase = 40, nDups = 12), grid = 8)
    val banded = Dedup.hammingNearDupPairs(sigs, "media_id", "dhash",
      maxHamming = 5, nBands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute force over the collected signatures
    val hs = sigs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = (for {
      a <- hs.keys; b <- hs.keys; if a < b
      d = java.lang.Long.bitCount(hs(a) ^ hs(b)); if d <= 5
    } yield (a, b, d)).toSet
    assert(banded === brute)
    // every planted dup (i, i+40) is within the threshold
    (0L until 12L).foreach { i =>
      assert(banded.exists { case (a, b, _) => a == i && b == i + 40 },
        s"planted pair ($i, ${i + 40}) missed")
    }
  }

  test("corrupt media: rows dropped, side-channel accumulator counts them") {
    val good = Multimodal.syntheticPngCorpus(spark, 10)
    // plant 3 corrupt rows: garbage bytes, an empty payload, and a null
    val bad = Seq(
      Multimodal.Media(100L, "image", Array[Byte](1, 2, 3, 4, 5),
        Multimodal.MediaMeta(None, None, None, None)),
      Multimodal.Media(101L, "image", Array.emptyByteArray,
        Multimodal.MediaMeta(None, None, None, None)),
      Multimodal.Media(102L, "image", null,
        Multimodal.MediaMeta(None, None, None, None)))
    val corpus = good.union(spark.createDataset(bad)(good.encoder))
    val (decoded, corrupt) = Multimodal.decodeImageIOWithMetrics(corpus)
    val rows = decoded.collect()
    assert(rows.length === 10)
    assert(rows.map(_.media_id).toSet === (0L until 10L).toSet)
    assert(corrupt.value === 3L)
    // same relation as the plain decoder, metric aside
    val plain = Multimodal.decodeImageIO(corpus).collect()
      .map(d => d.media_id -> d.checksum).toMap
    assert(rows.map(d => d.media_id -> d.checksum).toMap === plain)
  }

  test("frame sampling: videos only, stride respected") {
    val plan = Multimodal.frameSamplePlan(media, everyN = 5).collect()
    assert(plan.nonEmpty)
    plan.foreach { r =>
      val idx = r.getSeq[Int](1)
      assert(idx.head === 0)
      idx.sliding(2).foreach { w =>
        if (w.length == 2) assert(w(1) - w(0) === 5)
      }
    }
  }
}
