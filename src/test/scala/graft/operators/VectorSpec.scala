package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Similarity-search semantics vs a driver-side reference computation. */
class VectorSpec extends SparkSpec {

  private lazy val emb = Tables.load(spark, sf, "embeddings")

  private lazy val local: Map[Long, Array[Float]] = emb
    .select("vec_id", "embedding").collect()
    .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("brute-force cosine top-k matches a driver-side reference ranking") {
    val q = local(0L).map(_.toDouble).toSeq
    val got = Similarity.cosineTopK(emb, q, k = 10, excludeId = 0L).collect()
    val expected = local.view.filterKeys(_ != 0L)
      .map { case (id, v) => id -> cosine(v, local(0L)) }.toSeq
      .sortBy { case (id, c) => (-c, id) }.take(10)
    assert(got.map(_.getAs[Long]("vec_id")).toSeq === expected.map(_._1))
    got.zip(expected).foreach { case (row, (_, c)) =>
      assert(math.abs(row.getAs[Double]("cosine") - c) < 1e-9)
    }
  }

  test("LSH ANN results carry true cosine scores and stay in [-1,1]") {
    val q = local(0L).map(_.toDouble).toSeq
    val got = Similarity.annTopK(emb, q, k = 10, nPlanes = 4, seed = 42L,
      excludeId = 0L).collect()
    assert(got.nonEmpty && got.length <= 10)
    got.foreach { r =>
      val c = r.getAs[Double]("cosine")
      assert(c >= -1.0 && c <= 1.0)
      assert(math.abs(c - cosine(local(r.getAs[Long]("vec_id")), local(0L))) < 1e-9)
    }
  }

  test("mismatched vector lengths yield NULL, not a truncated similarity") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f, 3.0f)),
      (Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
      .select(graft.functions.VecCols.dot(col("a"), col("b")).as("d"),
        graft.functions.VecCols.cosine(col("a"), col("b")).as("c"))
    val rows = df.collect()
    assert(rows(0).getDouble(0) === 14.0 && math.abs(rows(0).getDouble(1) - 1.0) < 1e-12)
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
  }

  test("LSH bucketing is deterministic and buckets partition the corpus") {
    val planes = Similarity.hyperplanes(4, local(0L).length, 42L)
    val b1 = emb.select(col("vec_id"),
      Similarity.lshBucket(col("embedding"), planes).as("b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b2 = emb.select(col("vec_id"),
      Similarity.lshBucket(col("embedding"), planes).as("b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b1 === b2)
    assert(b1.values.forall(b => b >= 0 && b < 16))
  }

  test("IVF ANN: probed-cell results carry true cosines; cells partition the corpus") {
    val q = local(0L).map(_.toDouble).toSeq
    val got = Similarity.ivfTopK(emb, q, k = 10, nCells = 8, nProbe = 2,
      excludeId = 0L).collect()
    assert(got.nonEmpty && got.length <= 10)
    got.foreach { r =>
      assert(math.abs(r.getAs[Double]("cosine") -
        cosine(local(r.getAs[Long]("vec_id")), local(0L))) < 1e-9)
    }
    // every vector lands in exactly one of the nCells cells
    val centroids = emb.orderBy(col("vec_id")).limit(8)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq
    val cells = emb.select(
      Similarity.ivfAssign(col("embedding"), centroids).as("cell")).collect()
    assert(cells.forall { r => val c = r.getInt(0); c >= 0 && c < 8 })
  }

  test("banded LSH near-dups: full recall on planted dups, bounded buckets") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // synthetic corpus: 100 random 32-dim bases + 20 jittered near-copies
    // (the near-dup regime the operator exists for: cosine ≥ ~0.99)
    val rnd = new scala.util.Random(123)
    val dim = 32
    def vec() = Array.fill(dim)(rnd.nextGaussian().toFloat)
    val bases = (0 until 100).map(i => i.toLong -> vec())
    val dups = (0 until 20).map { i =>
      (1000 + i).toLong -> bases(i)._2.map(x => x + rnd.nextGaussian().toFloat * 0.02f)
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType), StructField("embedding",
        ArrayType(FloatType)), StructField("label", IntegerType)))
    val rows = (bases ++ dups).map { case (id, v) => Row(id, v.toSeq, 0) }
    val df = spark.createDataFrame(rows.asJava, schema)

    // brute-force truth at threshold 0.95
    val all = (bases ++ dups)
    val truth = (for {
      (ia, va) <- all; (ib, vb) <- all if ia < ib
      if cosine(va, vb) >= 0.95
    } yield (ia, ib)).toSet
    assert(truth.size >= 20) // every planted pair qualifies

    val got = Similarity.cosineNearDupPairsBanded(df, planesPerTable = 8,
      nTables = 8, seed = 99L, threshold = 0.95).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    // exact-cosine verification ⇒ perfect precision; OR-amplified tables ⇒
    // full recall on this (deterministic) corpus
    assert(got === truth)

    // scale story: no bucket in any table holds more than a small fraction
    // of the corpus, so the within-bucket self-join stays bounded
    val maxBucket = (0 until 8).map { t =>
      val planes = Similarity.hyperplanes(8, dim, 99L + t)
      df.groupBy(Similarity.lshBucket(col("embedding"), planes).as("b"))
        .count().agg(max("count")).head().getLong(0)
    }.max
    assert(maxBucket <= all.size / 4)
  }

  test("k-means centroids refine the first-N seed; IVF recall not degraded") {
    val q = local(0L).map(_.toDouble).toSeq
    val brute = Similarity.cosineTopK(emb, q, k = 10, excludeId = 0L)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val seedCentroids = Similarity.firstNCentroids(emb, 8)
    val refined = Similarity.kmeansCentroids(emb, nCells = 8, iters = 2)
    assert(refined.size === 8)
    assert(refined !== seedCentroids)
    def recall(cs: Seq[Seq[Double]]): Double = {
      val got = Similarity.ivfTopKWith(emb, q, k = 10, cs, nProbe = 2,
        excludeId = 0L).collect().map(_.getAs[Long]("vec_id")).toSet
      got.intersect(brute).size / 10.0
    }
    val (rSeed, rKm) = (recall(seedCentroids), recall(refined))
    assert(rKm >= rSeed && rKm > 0.0)
  }

  test("CentroidAgg per-cell means equal the exploded-avg formulation " +
      "and a driver-side reference") {
    val centroids = Similarity.firstNCentroids(emb, 8)
    val dim = centroids.head.length
    val assigned = emb.select(
      Similarity.ivfAssign(col("embedding"), centroids).as("cell"),
      col("embedding"))
    val agg = assigned.groupBy(col("cell"))
      .agg(graft.functions.CentroidAgg.vecMean(col("embedding"), dim)
        .as("m"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    // the dim×-row-inflating formulation CentroidAgg replaced — same
    // float→double widening, same row-order accumulation, one division
    val exploded = assigned
      .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("cell"), col("pos")).agg(avg(col("v")).as("m"))
      .groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("dims"))
      .collect().map(r => r.getInt(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(_.getDouble(1))).toMap
    assert(agg.keySet === exploded.keySet)
    for (cell <- agg.keySet; i <- 0 until dim)
      assert(math.abs(agg(cell)(i) - exploded(cell)(i)) < 1e-12)
    // and a driver-side reference over the collected vectors
    val byCell = assigned.collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1)).groupBy(_._1)
    for ((cell, rows) <- byCell; i <- 0 until dim) {
      val ref = rows.map(_._2(i).toDouble).sum / rows.length
      assert(math.abs(agg(cell)(i) - ref) < 1e-9)
    }
  }

  test("kmeans drops NULL embeddings (as the exploded form did); " +
      "CentroidAgg refuses null ELEMENTS loudly") {
    val base = emb.limit(20).select("vec_id", "label", "embedding")
      .localCheckpoint()
    val nullRow = base.limit(1).select(lit(999L).as("vec_id"),
      lit("x").as("label"),
      lit(null).cast("array<float>").as("embedding"))
    // a NULL vector must not NPE the refinement — it simply contributes
    // to no cell, exactly as posexplode(NULL) contributed no rows
    val cs = Similarity.kmeansCentroids(base.unionByName(nullRow),
      nCells = 4, iters = 1)
    assert(cs.size === 4)
    assert(cs === Similarity.kmeansCentroids(base, nCells = 4, iters = 1))
    // a null ELEMENT would silently read as 0.0 and skew the mean —
    // refused loudly instead (the fixed-width contract)
    val dim = cs.head.length
    val ragged = base.limit(1).select(
      array((lit(null).cast("float") +:
        Seq.fill(dim - 1)(lit(1.0f))): _*).as("embedding"))
    val e = intercept[Exception] {
      ragged.agg(graft.functions.CentroidAgg.vecMean(col("embedding"), dim))
        .collect()
    }
    assert(e.getMessage.contains("null") ||
      Option(e.getCause).exists(_.getMessage.contains("null")))
  }

  test("near-dup pairs: symmetric-free (a<b), thresholded, true cosines") {
    val pairs = Similarity.cosineNearDupPairs(emb, nPlanes = 3, seed = 7L,
      threshold = 0.30).collect()
    pairs.foreach { r =>
      val (a, b, c) = (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"),
        r.getAs[Double]("cosine"))
      assert(a < b && c >= 0.30)
      assert(math.abs(c - cosine(local(a), local(b))) < 1e-9)
    }
  }

  test("dynamic oracle (q50): stable across calls, centroids shared with the query") {
    import graft.queries.Registry
    Registry.resetTransientCaches()
    val sql1 = Registry.dynamicOracleSql(spark, sf)("q50_ivf_kmeans_topk")
    val sql2 = Registry.dynamicOracleSql(spark, sf)("q50_ivf_kmeans_topk")
    // memoized: the second generation embeds byte-identical literals, so
    // the query dump and the oracle can never desynchronize in-process
    assert(sql1 === sql2)
    // 8 centroid rows of 64 literals each, as a VALUES list
    assert("\\(\\d+, \\[".r.findAllIn(sql1).size === 8)
    // the oracle must carry literal doubles, not references to Spark state
    assert(!sql1.contains("???") && sql1.contains("VALUES"))
  }

  test("TopKAgg: rank order, id tiebreak, k cap — stable across partitionings") {
    import spark.implicits._
    import graft.functions.TopKAgg
    // score ties (20.0 twice) must break toward the smaller id; k=3 drops
    // the rest; nulls are skipped
    val rows = Seq((30.0, 7L), (20.0, 9L), (20.0, 2L), (10.0, 1L), (5.0, 8L))
    def run(parts: Int): Seq[Long] =
      rows.toDF("score", "id").repartition(parts)
        .agg(TopKAgg.topk(col("score"), col("id"), 3).as("top"))
        .head().getSeq[Long](0)
    assert(run(1) === Seq(7L, 2L, 9L))
    // forcing partial buffers + merge across 4 partitions changes nothing
    assert(run(4) === Seq(7L, 2L, 9L))
    // fewer rows than k: all of them, still rank-ordered
    val few = Seq((1.0, 5L), (2.0, 3L)).toDF("score", "id")
      .agg(TopKAgg.topk(col("score"), col("id"), 10)).head().getSeq[Long](0)
    assert(few === Seq(3L, 5L))
    // NaN scores rank like NULL (skipped): they neither occupy a slot nor
    // block later finite inserts once the buffer fills
    val nan = Seq((Double.NaN, 99L), (3.0, 4L), (Double.NaN, 98L), (1.0, 6L),
        (2.0, 5L)).toDF("score", "id")
      .agg(TopKAgg.topk(col("score"), col("id"), 2)).head().getSeq[Long](0)
    assert(nan === Seq(4L, 5L))
  }

  test("SQ8 quantization: codes in range, exact recovery at full rerank") {
    val scale = Similarity.sq8Scale(emb)
    assert(scale > 0.0 && scale <= 1.0) // a normalized coordinate's bound
    // corpus codes all land in [-127, 127]
    val codes = emb.select(
        graft.functions.VecCols.norm(col("embedding")).as("nm"),
        col("embedding"))
      .select(Similarity.sq8Codes(col("embedding"), col("nm"), scale).as("c"))
      .select(explode(col("c")).as("v")).agg(min("v"), max("v")).head()
    assert(codes.getInt(0) >= -127 && codes.getInt(1) <= 127)
    val q = local(0L).map(_.toDouble).toSeq
    // with rerank = whole corpus, the exact re-rank recovers brute force
    val n = emb.count().toInt
    val full = Similarity.quantizedTopK(emb, q, k = 10, scale, rerank = n,
      excludeId = 0L).collect().map(_.getAs[Long]("vec_id")).toSeq
    val brute = Similarity.cosineTopK(emb, q, k = 10, excludeId = 0L)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(full === brute)
    // at rerank=20 the symmetric-normalized code dot keeps high recall
    val ann = Similarity.quantizedTopK(emb, q, k = 10, scale, rerank = 20,
      excludeId = 0L).collect().map(_.getAs[Long]("vec_id")).toSet
    assert(brute.toSet.intersect(ann).size >= 8)
  }

  test("knnJoinBucketed equals per-query ivfTopKWith on the probed cells") {
    import spark.implicits._
    val centroids = Similarity.firstNCentroids(emb, 8)
    val qids = Seq(0L, 3L, 11L)
    val queries = emb.filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val got = Similarity.knnJoinBucketed(emb, queries, k = 5, centroids, nProbe = 2)
      .collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) =>
        q -> rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("vec_id")).toSeq }
    qids.foreach { qid =>
      val expect = Similarity.ivfTopKWith(emb, local(qid).map(_.toDouble).toSeq,
        k = 5, centroids, nProbe = 2, excludeId = qid)
        .collect().map(_.getAs[Long]("vec_id")).toSeq
      assert(got(qid) === expect, s"query $qid")
    }
    // a query relation of one row still produces k ranked rows
    val one = Similarity.knnJoinBucketed(emb,
      queries.filter(col("query_id") === 0L), k = 5, centroids, nProbe = 2)
    assert(one.count() === 5)
  }

  test("knnJoinBucketed salted fallback: identical results on a skewed-cell corpus, no broadcast hint") {
    import spark.implicits._
    // synthetic corpus engineered for cell skew: 100 of 120 vectors point
    // near the same direction (one hot IVF cell), the rest spread — the
    // shape where a plain cell-keyed shuffle join piles one reducer high
    val rnd = new scala.util.Random(7L)
    val base = Array.fill(8)(rnd.nextGaussian().toFloat)
    val rows = (0L until 120L).map { id =>
      val v =
        if (id < 100) base.map(x => x + 0.05f * rnd.nextGaussian().toFloat)
        else Array.fill(8)(rnd.nextGaussian().toFloat)
      (id, s"v$id", v.toSeq)
    }
    val corpus = rows.toDF("vec_id", "label", "embedding")
      .select(col("vec_id"), col("label"), col("embedding").cast("array<float>"))
    val centroids = Similarity.firstNCentroids(corpus, 4)
    val queries = corpus.filter(col("vec_id").isin(0L, 1L, 50L, 101L, 110L))
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))

    def collected(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("vec_id"))).toSet

    // salting is pure re-keying: results identical to the broadcast path
    val bcast = Similarity.knnJoinBucketed(corpus, queries, k = 5, centroids,
      nProbe = 2)
    val salted = Similarity.knnJoinBucketed(corpus, queries, k = 5, centroids,
      nProbe = 2, saltBuckets = 5)
    assert(collected(salted) === collected(bcast))
    // the fallback really dropped the hint (AQE may still pick a broadcast
    // join at these test sizes — the contract is no FORCED broadcast; the
    // analyzed plan is where the hint is visible before the optimizer
    // folds it into the Join node)
    assert(bcast.queryExecution.analyzed.toString.contains("ResolvedHint"))
    assert(!salted.queryExecution.analyzed.toString.contains("ResolvedHint"))
    // probing ALL cells makes the ANN exact: salted output must equal the
    // brute-force kNN join per query
    val allCells = Similarity.knnJoinBucketed(corpus, queries, k = 5, centroids,
      nProbe = 4, saltBuckets = 3)
    val localVecs = rows.map { case (id, _, v) => id -> v.toArray }.toMap
    val brute = Similarity.knnJoin(corpus,
      Seq(0L, 1L, 50L, 101L, 110L).map(id =>
        id -> localVecs(id).map(_.toDouble).toSeq), k = 5)
    assert(collected(allCells) === collected(brute))
  }

  test("knnJoin equals per-query cosineTopK") {
    val queries = Seq(0L, 1L, 2L).map(id => id -> local(id).map(_.toDouble).toSeq)
    val got = Similarity.knnJoin(emb, queries, k = 5).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) =>
        q -> rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("vec_id")).toSeq }
    queries.foreach { case (qid, qv) =>
      val expect = Similarity.cosineTopK(emb, qv, k = 5, excludeId = qid)
        .collect().map(_.getAs[Long]("vec_id")).toSeq
      assert(got(qid) === expect, s"query $qid")
    }
  }

  test("pqTopK: ADC candidates + exact re-rank keep recall; widening " +
      "rerank recovers brute force") {
    val emb = graft.Tables.load(spark, sf, "embeddings")
    val q = Similarity.firstNCentroids(emb, 1).head
    val brute = Similarity.cosineTopK(emb, q, 10, excludeId = 0L)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val pq = Similarity.pqTopK(emb, q, 10, excludeId = 0L)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    // 16-centroid first-N codebook at rerank=40: measured 8/10 on this
    // corpus; ≥6 leaves head-room without letting a broken encoder pass
    assert(pq.intersect(brute).size >= 6, s"recall ${pq.intersect(brute).size}/10")
    // rerank = corpus size degenerates to exact: the ADC stage then only
    // orders the candidate sweep, and the exact re-rank decides everything
    val n = emb.count().toInt
    val full = Similarity.pqTopK(emb, q, 10, rerank = n, excludeId = 0L)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(full === brute)
    intercept[IllegalArgumentException](
      Similarity.pqTopK(emb, q, k = 10, rerank = 5)) // rerank < k
    intercept[IllegalArgumentException](
      Similarity.pqTopK(emb, q, k = 10, m = 7)) // 64 % 7 != 0
  }

  test("persisted IVF index: serving equals the live-corpus query, and " +
      "the probe filter is physical partition pruning") {
    val centroids = Similarity.firstNCentroids(emb, 8)
    val q = local(0L).map(_.toDouble).toSeq
    val idx = tmpDir("graft-ivf-idx")
    Similarity.writeIvfIndex(emb, centroids, idx)
    // cell directories exist (partitionBy layout)
    val cellDirs = new java.io.File(s"$idx/cells").listFiles()
      .filter(_.getName.startsWith("cell=")).map(_.getName).toSet
    assert(cellDirs.nonEmpty && cellDirs.subsetOf(
      (0 until 8).map(i => s"cell=$i").toSet))
    val served = Similarity.ivfTopKFromIndex(spark, idx, q, k = 10,
      nProbe = 2, excludeId = 0L)
    val live = Similarity.ivfTopKWith(emb, q, k = 10, centroids,
      nProbe = 2, excludeId = 0L)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.get(1))).toSeq
    assert(ids(served) === ids(live))
    // the cell filter reached the scan as a PARTITION filter, not a
    // data filter: only the probed directories are read
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters:") && plan.contains("cell"),
      s"no partition pruning in:\n$plan")
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"cell not in PartitionFilters:\n$plan")
  }

  test("IVF-PQ composed index: full-probe full-rerank equals brute force; " +
      "default budgets equal cell-restricted pqTopK; ADC scan prunes cells " +
      "and projects only the code column") {
    val centroids = Similarity.firstNCentroids(emb, 8)
    val q = local(0L).map(_.toDouble).toSeq
    val idx = tmpDir("graft-ivfpq-idx")
    Similarity.writeIvfPqIndex(emb, centroids, idx, m = 8, kCent = 16)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.getAs[Long]("vec_id")).toSeq
    // every cell probed + rerank = corpus → EXACT top-k: the stored
    // codes only gate the candidate order, the re-rank is exact cosine
    val n = emb.count().toInt
    val exhaustive = Similarity.ivfPqTopKFromIndex(spark, idx, q, k = 10,
      nProbe = 8, rerank = n, excludeId = 0L)
    assert(ids(exhaustive) ===
      ids(Similarity.cosineTopK(emb, q, 10, excludeId = 0L)))
    // default budgets: stored codes reproduce the LIVE pq encoding —
    // all-probe serving equals pqTopK (same codebook, same ADC order)
    val allProbe = Similarity.ivfPqTopKFromIndex(spark, idx, q, k = 10,
      nProbe = 8, rerank = 40, excludeId = 0L)
    assert(ids(allProbe) === ids(Similarity.pqTopK(emb, q, k = 10,
      m = 8, kCent = 16, rerank = 40, excludeId = 0L)))
    // probed serving: partition pruning reached the ADC scan, and the
    // candidate phase reads ONLY (vec_id, codes) — never the floats
    val served = Similarity.ivfPqTopKFromIndex(spark, idx, q, k = 10,
      nProbe = 2, rerank = 40, excludeId = 0L)
    assert(ids(served).size === 10)
    val plan = served.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"cell not in PartitionFilters:\n$plan")
    val adcScan = "ReadSchema: [^\\n]*codes[^\\n]*".r.findFirstIn(plan)
    assert(adcScan.isDefined, s"no codes-projecting scan in:\n$plan")
    assert(!adcScan.get.contains("embedding"),
      s"the ADC scan must not read the float embeddings:\n${adcScan.get}")
  }

  test("knnJoinFromIndex: serving the persisted index equals the live " +
      "bucketed join, with partition-pruned cell scans") {
    import org.apache.spark.sql.functions.col
    val centroids = Similarity.firstNCentroids(emb, 8)
    val idx = tmpDir("ivf-join-idx")
    Similarity.writeIvfIndex(emb, centroids, idx)
    val queries = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Int]("rank"), r.getAs[Long]("vec_id"))).toSet
    val live = rows(Similarity.knnJoinBucketed(emb, queries, k = 3,
      centroids, nProbe = 2))
    val served = Similarity.knnJoinFromIndex(spark, idx, queries, k = 3,
      nProbe = 2)
    assert(rows(served) === live)
    // salted fallback serves identically too
    assert(rows(Similarity.knnJoinFromIndex(spark, idx, queries, k = 3,
      nProbe = 2, saltBuckets = 4)) === live)
    // the probed-cell union reached the index scan as a PARTITION
    // filter: only probed cell directories are read, Q-independent
    val plan = served.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"cell not in PartitionFilters:\n$plan")
  }

  test("appendToIvfIndex: two-batch build equals the one-shot index, batch-1 " +
      "files untouched") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.load(spark, sf, "embeddings")
    val centroids = Similarity.firstNCentroids(emb, 8)
    val incr = tmpDir("ivf-incr"); val full = tmpDir("ivf-full")
    Similarity.writeIvfIndex(emb.filter(col("vec_id") % 2 === 0), centroids, incr)
    val before = new java.io.File(s"$incr/cells").listFiles()
      .filter(_.getName.startsWith("cell="))
      .flatMap(d => d.listFiles().map(f => f.getPath -> f.lastModified())).toMap
    Similarity.appendToIvfIndex(emb.filter(col("vec_id") % 2 =!= 0), incr)
    Similarity.writeIvfIndex(emb, centroids, full)
    def content(p: String) = spark.read.parquet(s"$p/cells")
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.get(1).toString)).toSet
    assert(content(incr) === content(full))
    // append added files; it must not have rewritten batch 1's
    before.foreach { case (path, mtime) =>
      val f = new java.io.File(path)
      assert(f.exists && f.lastModified() === mtime, path)
    }
  }

  test("reclusterIvfIndex: new generation holds identical content under " +
      "refined centroids; old generation untouched; same-path refused") {
    import org.apache.spark.sql.functions.col
    val old = tmpDir("ivf-reclu-old"); val next = tmpDir("ivf-reclu-new")
    val lowHalf = emb.filter(col("vec_id") < 300)
    Similarity.writeIvfIndex(lowHalf,
      Similarity.firstNCentroids(lowHalf, 4), old)
    Similarity.appendToIvfIndex(emb.filter(col("vec_id") >= 300), old)
    val oldFiles = new java.io.File(s"$old/cells").listFiles()
      .filter(_.getName.startsWith("cell="))
      .flatMap(d => d.listFiles().map(f => f.getPath -> f.lastModified()))
      .toMap
    val refined = Similarity.reclusterIvfIndex(spark, old, next, iters = 3)
    // refined == warm-started Lloyd over the union, from the old sidecar
    val expected = Similarity.kmeansRefine(emb,
      Similarity.firstNCentroids(lowHalf, 4), 3)
    assert(refined === expected)
    // content identity: every vector exactly once, assigned under the
    // refined quantizer
    def ids(p: String) = spark.read.parquet(s"$p/cells")
      .select("vec_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(ids(next) === ids(old))
    val wantCells = emb
      .select(col("vec_id"), Similarity.ivfAssign(col("embedding"),
        refined).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    spark.read.parquet(s"$next/cells")
      .select("vec_id", "cell").collect().foreach { r =>
        assert(wantCells(r.getLong(0)) === r.get(1).toString.toInt)
      }
    // the old generation's files are bit-for-bit untouched
    oldFiles.foreach { case (path, mtime) =>
      val f = new java.io.File(path)
      assert(f.exists && f.lastModified() === mtime, path)
    }
    // and rewriting in place is refused
    intercept[IllegalArgumentException](
      Similarity.reclusterIvfIndex(spark, old, old, iters = 1))
  }

  test("contaminationFromIndex: exhaustive probes equal brute force; fewer " +
      "probes are a subset (recall, never precision)") {
    import org.apache.spark.sql.functions.col
    val centroids = Similarity.firstNCentroids(emb, 8)
    val idx = tmpDir("sem-idx")
    Similarity.writeIvfIndex(emb.filter(col("vec_id") % 2 === 0),
      centroids, idx)
    val ev = emb.filter(col("vec_id") % 2 =!= 0)
    val tau = 0.3 // low enough to yield pairs on the tiny sf
    def pairs(nProbe: Int) = Similarity
      .contaminationFromIndex(spark, idx, ev, tau, nProbe)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exhaustive = pairs(8)
    // driver-side brute force over every cross-split pair
    val brute = (for {
      (ei, evv) <- local.toSeq if ei % 2 == 1
      (ti, tvv) <- local.toSeq if ti % 2 == 0
      if cosine(evv, tvv) >= tau
    } yield (ei, ti)).toSet
    assert(exhaustive === brute)
    assert(brute.nonEmpty, "threshold found no pairs — weak test data")
    // candidate pruning only loses pairs, never invents them
    val probed = pairs(2)
    assert(probed.subsetOf(exhaustive))
    // every emitted pair is exactly verified regardless of probe count
    probed.foreach { case (e, t) =>
      assert(cosine(local(e), local(t)) >= tau)
    }
  }
}
