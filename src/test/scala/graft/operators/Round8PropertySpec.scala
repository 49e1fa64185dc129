package graft.operators

import org.scalacheck.Gen

import graft.SparkSpec

/** Property checks for the round-8 operators: seeded random inputs with
  * adversarial shapes (clustered signatures forcing band collisions,
  * colliding percentile labels, random two-generation schemas), each
  * compared against a plain-Scala brute-force reference. */
class Round8PropertySpec extends SparkSpec {

  import spark.implicits._

  private val params = Gen.Parameters.default.withSize(30)
  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(params, org.scalacheck.rng.Seed(seed)).get

  test("hammingNearDupPairs equals all-pairs brute force across band " +
      "configs, including clustered signatures") {
    // signatures clustered around a few anchors (small random bit flips)
    // force real band collisions and near-threshold distances
    val genSigs: Gen[List[Long]] = for {
      anchors <- Gen.listOfN(3, Gen.long)
      sigs <- Gen.listOfN(40, for {
        a <- Gen.oneOf(anchors)
        nFlips <- Gen.choose(0, 8)
        flips <- Gen.listOfN(nFlips, Gen.choose(0, 63))
      } yield flips.foldLeft(a)((s, b) => s ^ (1L << b)))
    } yield sigs
    for (trial <- 1 to 5; (maxH, nBands) <- Seq((3, 4), (5, 8), (7, 8), (1, 2))) {
      val sigs = sample(genSigs, trial * 31L + maxH).zipWithIndex
        .map { case (s, i) => (i.toLong, s) }
      val df = sigs.toDF("id", "sig")
      val got = Dedup.hammingNearDupPairs(df, "id", "sig", maxH, nBands)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val want = (for {
        (a, sa) <- sigs; (b, sb) <- sigs; if a < b
        d = java.lang.Long.bitCount(sa ^ sb); if d <= maxH
      } yield (a, b, d)).toSet
      assert(got === want, s"trial=$trial maxH=$maxH nBands=$nBands")
    }
    // guard rails: banding that could lose pairs is rejected, not silent
    val df = Seq((0L, 0L), (1L, -1L)).toDF("id", "sig")
    intercept[IllegalArgumentException](
      Dedup.hammingNearDupPairs(df, "id", "sig", maxHamming = 4, nBands = 4))
    intercept[IllegalArgumentException](
      Dedup.hammingNearDupPairs(df, "id", "sig", maxHamming = 2, nBands = 5))
  }

  test("incremental minhash dedup equals batch-filtered for random splits") {
    val docs = graft.Tables.load(spark, sf, "documents")
    for (trial <- 1 to 2) {
      val mod = trial + 2 // splits 1/3, 1/4 old — uneven batch sizes
      val idxPath = tmpDir(s"graft-prop-mh-$trial")
      Dedup.writeMinHashIndex(
        docs.filter(org.apache.spark.sql.functions.col("doc_id") % mod === 0),
        k = 32, path = idxPath)
      val inc = Dedup.minHashNearDupsIncremental(
        docs.filter(org.apache.spark.sql.functions.col("doc_id") % mod =!= 0),
        spark.read.parquet(idxPath), k = 32, rowsPerBand = 4, threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val fullPairs: Set[(Long, Long)] = Dedup.minHashNearDups(docs, 32, 4, 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val full = fullPairs.filter(p => p._1 % mod != 0 || p._2 % mod != 0)
      assert(inc === full, s"mod=$mod")
    }
  }

  test("percentile labels: distinct ps get distinct labels or fail fast") {
    assert(Quantiles.pLabel(0.5) === "p50")
    assert(Quantiles.pLabel(0.99) === "p99")
    assert(Quantiles.pLabel(0.995) === "p99_5")
    assert(Quantiles.pLabel(0.001) === "p0_1")
    Quantiles.requireDistinctLabels(Seq(0.25, 0.5, 0.75, 0.95, 0.995))
    intercept[IllegalArgumentException](
      Quantiles.requireDistinctLabels(Seq(0.9999, 1.0)))
    // random distinct per-mille ps never collide
    for (trial <- 1 to 5) {
      val ps = sample(Gen.listOfN(8, Gen.choose(1, 1000)), trial * 7L)
        .distinct.map(_ / 1000.0)
      Quantiles.requireDistinctLabels(ps)
      assert(ps.map(Quantiles.pLabel).distinct.size === ps.size)
    }
  }

  test("dHash: uniform brightness shifts never change the hash; random " +
      "structural edits usually do") {
    def img(w: Int, h: Int, px: (Int, Int) => Int) = {
      val im = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, px(x, y))
      im
    }
    for (trial <- 1 to 6) {
      val seed = trial * 97L
      val (w, h) = (12 + trial, 10 + trial % 3)
      // channels masked to ≤191 so a lift ≤60 NEVER saturates: dHash
      // brightness invariance is exact only while the shift is uniform —
      // clamping at 255 shifts saturated pixels less and can genuinely
      // flip a near-tie comparison (observed with full-range pixels)
      def base(x: Int, y: Int) =
        graft.multimodal.Multimodal.syntheticPixel(seed, x, y) & 0xbfbfbf
      val hBase = graft.multimodal.Multimodal.dHash(img(w, h, base))
      val lift = sample(Gen.choose(1, 60), seed)
      def brighter(x: Int, y: Int) = base(x, y) + (lift << 16) + (lift << 8) + lift
      val hBright = graft.multimodal.Multimodal.dHash(img(w, h, brighter))
      assert(hBright === hBase, s"trial=$trial lift=$lift")
      def shuffled(x: Int, y: Int) = base((x * 5 + y) % w, (y * 3 + x) % h)
      val hShuf = graft.multimodal.Multimodal.dHash(img(w, h, shuffled))
      assert(java.lang.Long.bitCount(hBase ^ hShuf) > 5, s"trial=$trial")
    }
  }
}
