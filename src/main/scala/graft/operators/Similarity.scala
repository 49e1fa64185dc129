package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.VecCols

/** Similarity search over embedding columns (`ArrayType(FloatType)`).
  *
  * Baseline: brute-force cosine top-k (one scan, TakeOrderedAndProject —
  * no global sort). Scale path: random-hyperplane LSH bucketing so the
  * scan only touches the query's bucket(s); planes are generated from a
  * fixed seed so bucketing is deterministic across runs and engines.
  *
  * All vector math uses the native codegen expressions in
  * [[graft.functions]] (FloatVecDot/Cosine/Norm) — a single primitive loop
  * per row inside whole-stage codegen, vs. the interpreted per-element
  * lambda of `zip_with`+`aggregate`.
  */
object Similarity {

  private def litVec(q: Seq[Double]): Column =
    typedlit(q.map(_.toFloat))

  /** dot(embedding, literal query vector) in double precision. */
  def dotWithLit(emb: Column, q: Seq[Double]): Column =
    VecCols.dot(emb, litVec(q))

  /** L2 norm of an array column, in double. */
  def l2Norm(emb: Column): Column = VecCols.norm(emb)

  /** Cosine similarity against a literal query vector. */
  def cosineWithLit(emb: Column, q: Seq[Double]): Column =
    VecCols.cosine(emb, litVec(q))

  /** Brute-force cosine top-k neighbors of `q` (excluding `excludeId`). */
  def cosineTopK(emb: DataFrame, q: Seq[Double], k: Int,
      excludeId: Long = -1L): DataFrame =
    emb.filter(col("vec_id") =!= excludeId)
      .select(col("vec_id"), col("label"),
        cosineWithLit(col("embedding"), q).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)

  /** Deterministic random hyperplanes: nPlanes × dim gaussians from a
    * seeded PRNG (driver-side constants, folded into the plan). */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-of-dot LSH bucket id (one bit per plane). */
  def lshBucket(emb: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dotWithLit(emb, p) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH-bucketed ANN top-k: score only the vectors in the query's bucket.
    * At cluster scale the bucket column would be a partition/bucketing key,
    * making this a single-partition lookup instead of a full scan. */
  def annTopK(emb: DataFrame, q: Seq[Double], k: Int, nPlanes: Int,
      seed: Long, excludeId: Long = -1L): DataFrame = {
    val dim = q.length
    val planes = hyperplanes(nPlanes, dim, seed)
    // mirror the executor arithmetic exactly: litVec casts plane/query
    // values to float32, so the driver-side bucket must too — otherwise a
    // near-zero plane dot can flip sign and the query misses its own bucket
    val qBucket = planes.zipWithIndex.map { case (p, i) =>
      val dot = p.zip(q).map { case (a, b) =>
        a.toFloat.toDouble * b.toFloat.toDouble
      }.sum
      if (dot >= 0) 1L << i else 0L
    }.sum
    emb.withColumn("bucket", lshBucket(col("embedding"), planes))
      .filter(col("bucket") === qBucket && col("vec_id") =!= excludeId)
      .select(col("vec_id"), col("label"),
        cosineWithLit(col("embedding"), q).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  /** IVF (inverted-file) cell assignment: index of the max-dot centroid.
    * Centroids are a deterministic coarse quantizer (here: the first
    * nCells vectors by id; a k-means refinement drops in without changing
    * the operator). At scale `cell` is the partition/bucket key. */
  def ivfAssign(emb: Column, centroids: Seq[Seq[Double]]): Column = {
    val dots = array(centroids.map(c => dotWithLit(emb, c)): _*)
    (array_position(dots, array_max(dots)) - 1).cast(IntegerType)
  }

  /** IVF ANN top-k: probe the `nProbe` centroid cells nearest the query
    * and score only those cells' vectors — the coarse-quantization
    * alternative to [[annTopK]]'s hyperplane LSH. */
  def ivfTopK(emb: DataFrame, q: Seq[Double], k: Int, nCells: Int,
      nProbe: Int, excludeId: Long = -1L): DataFrame = {
    val centroids = emb.orderBy(col("vec_id")).limit(nCells)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq
    // float-cast mirror of ivfAssign's executor arithmetic (see annTopK)
    val qDots = centroids.map(c => c.zip(q).map { case (a, b) =>
      a.toFloat.toDouble * b.toFloat.toDouble
    }.sum)
    val probes = qDots.zipWithIndex.sortBy(-_._1).take(nProbe).map(_._2)
    emb.withColumn("cell", ivfAssign(col("embedding"), centroids))
      .filter(col("cell").isin(probes: _*) && col("vec_id") =!= excludeId)
      .select(col("vec_id"), col("label"),
        cosineWithLit(col("embedding"), q).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  /** Embedding-cosine near-duplicate pairs via LSH buckets: only pairs in
    * the same bucket are scored (bucket-equi-join, never the full cross
    * product), then thresholded on exact cosine. */
  def cosineNearDupPairs(emb: DataFrame, nPlanes: Int, seed: Long,
      threshold: Double): DataFrame = {
    val first = emb.select(col("embedding")).head(1)
    if (first.isEmpty) {
      // empty corpus degrades to an empty pair set, like every other op here
      return emb.limit(0).select(col("vec_id").as("vec_a"),
        col("vec_id").as("vec_b"), lit(0.0).as("cosine"))
    }
    val dim = first.head.getSeq[Float](0).length
    val planes = hyperplanes(nPlanes, dim, seed)
    val b = emb.select(col("vec_id"), col("embedding"),
      lshBucket(col("embedding"), planes).as("bucket"))
    b.as("a").join(b.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        VecCols.cosine(col("a.embedding"), col("b.embedding")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
