package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.operators.Similarity

/** Similarity-search + vector-stats query surface over `embeddings`
  * (`embedding: ArrayType(FloatType)`, 64-dim).
  *
  * Cosine scores involve a 64-term float dot product whose summation order
  * differs between engines, so the top-k queries are rows-only checks; the
  * dimension-stats query uses the decimal-exact sum and has a full oracle.
  */
object VectorQueries {

  /** The query vector: embedding of vec_id 0, collected driver-side (a
    * single 64-float row — the idiomatic "query point" pattern; at scale
    * this is a lookup, not a scan, when vec_id is the sort/bucket key). */
  private def queryVec(spark: org.apache.spark.sql.SparkSession, dir: String): Seq[Double] =
    Tables.load(spark, dir, "embeddings")
      .filter(col("vec_id") === 0L).select(col("embedding"))
      .head().getSeq[Float](0).map(_.toDouble)

  /** Brute-force cosine top-10 neighbors of vec_id 0. */
  val q30 = Q(
    "q30_cosine_topk",
    (spark, dir) => Similarity.cosineTopK(
      Tables.load(spark, dir, "embeddings"), queryVec(spark, dir), k = 10,
      excludeId = 0L),
    None
  )

  /** LSH-bucketed ANN top-10 for the same query (the 100 TB scale path:
    * score only the query's bucket). */
  val q31 = Q(
    "q31_ann_lsh_topk",
    (spark, dir) => Similarity.annTopK(
      Tables.load(spark, dir, "embeddings"), queryVec(spark, dir), k = 10,
      nPlanes = 4, seed = 42L, excludeId = 0L),
    None
  )

  /** Per-dimension statistics (posexplode ≡ DuckDB zipped unnest).
    *
    * The exact sum casts float→string→decimal on BOTH sides: a float's
    * shortest decimal rendering is identical in the two engines, and both
    * round the same digit string half-away at scale 10 — whereas a direct
    * double→decimal cast rounds Spark's shortest-string repr vs DuckDB's
    * full binary expansion, which disagree ~1 ulp on rare values. */
  val q32 = Q(
    "q32_dim_stats",
    (spark, dir) => {
      Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy((col("pos") + 1).as("dim"))
        .agg(count(lit(1)).as("n"),
          sum(col("v").cast(StringType).cast(DecimalType(28, 10)))
            .cast(DoubleType).as("sum_val"),
          min(col("v").cast(DoubleType)).as("min_val"),
          max(col("v").cast(DoubleType)).as("max_val"))
    },
    Some("""SELECT CAST(i AS INTEGER) AS dim, COUNT(*) AS n,
      CAST(CAST(SUM(CAST(CAST(v AS VARCHAR) AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS sum_val,
      MIN(CAST(v AS DOUBLE)) AS min_val,
      MAX(CAST(v AS DOUBLE)) AS max_val
    FROM (SELECT unnest(embedding) AS v,
                 unnest(generate_series(1, len(embedding))) AS i
          FROM embeddings)
    GROUP BY 1""")
  )

  /** Embedding-cosine near-duplicate pairs via LSH buckets. The corpus is
    * near-orthogonal random vectors (max pairwise cosine ≈ 0.51), so the
    * "near-dup" threshold is 0.30 — the operator semantics, not the
    * threshold, are what carries to a real corpus. */
  val q33 = Q(
    "q33_embedding_near_dups",
    (spark, dir) => Similarity.cosineNearDupPairs(
      Tables.load(spark, dir, "embeddings"), nPlanes = 3, seed = 7L,
      threshold = 0.30),
    None
  )

  /** IVF-probed ANN top-10 (coarse-quantizer variant of q31). */
  val q34 = Q(
    "q34_ivf_topk",
    (spark, dir) => Similarity.ivfTopK(
      Tables.load(spark, dir, "embeddings"), queryVec(spark, dir), k = 10,
      nCells = 8, nProbe = 2, excludeId = 0L),
    None
  )

  val all: Seq[Q] = Seq(q30, q31, q32, q33, q34)
}
