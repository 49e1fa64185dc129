package graft.multimodal

import graft.{SparkSpec, Tables}

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
