package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over embedding columns (`ArrayType(FloatType)`).
  *
  * Baseline: brute-force cosine top-k (one scan, TakeOrderedAndProject —
  * no global sort). Scale path: random-hyperplane LSH bucketing so the
  * scan only touches the query's bucket(s); planes are generated from a
  * fixed seed so bucketing is deterministic across runs and engines.
  */
object Similarity {

  /** dot(embedding, literal query vector) in double precision. */
  def dotWithLit(emb: Column, q: Seq[Double]): Column =
    aggregate(
      zip_with(emb, typedlit(q), (x, y) => x.cast(DoubleType) * y),
      lit(0.0), (acc, x) => acc + x)

  /** L2 norm of an array column, in double. */
  def l2Norm(emb: Column): Column =
    sqrt(aggregate(emb, lit(0.0),
      (acc, x) => acc + x.cast(DoubleType) * x.cast(DoubleType)))

  /** Cosine similarity against a literal query vector. */
  def cosineWithLit(emb: Column, q: Seq[Double]): Column = {
    val qn = math.sqrt(q.map(x => x * x).sum)
    dotWithLit(emb, q) / (l2Norm(emb) * lit(qn))
  }

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
    val qBucket = planes.zipWithIndex.map { case (p, i) =>
      if (p.zip(q).map { case (a, b) => a * b }.sum >= 0) 1L << i else 0L
    }.sum
    emb.withColumn("bucket", lshBucket(col("embedding"), planes))
      .filter(col("bucket") === qBucket && col("vec_id") =!= excludeId)
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
    val first = emb.select(col("embedding")).head()
    val dim = first.getSeq[Float](0).length
    val planes = hyperplanes(nPlanes, dim, seed)
    val b = emb.select(col("vec_id"), col("embedding"),
      lshBucket(col("embedding"), planes).as("bucket"))
    val dot = aggregate(
      zip_with(col("a.embedding"), col("b.embedding"),
        (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc: Column, x: Column) => acc + x)
    b.as("a").join(b.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        (dot / (l2Norm(col("a.embedding")) * l2Norm(col("b.embedding"))))
          .as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
