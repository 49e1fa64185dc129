package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.operators.{Dedup, Sampling, TextAnalysis => TA}

/** The training-data curation CLI: the runnable composition of the
  * LLM-pipeline operators — quality scoring → exact dedup → near-dup
  * cluster collapse → deterministic train/val/test split → partitioned
  * parquet + a per-stage stats sidecar.
  *
  * Every stage is a declarative DataFrame transform (scored by the same
  * expressions q41 verifies against the oracle; clusters from
  * [[Dedup.dupClusters]]; splits from [[Sampling.splitAssign]]), so the
  * whole program is one Catalyst-planned pipeline per stage — no
  * driver-side row loops. The output is partitioned by split, the layout
  * downstream training jobs prune on.
  */
object CurateMain {

  final case class Result(input: Long, afterQuality: Long, afterExact: Long,
    afterNearDup: Long, outputPath: String)

  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println(
        "Usage: CurateMain <documents.parquet> <outDir> [minQuality] " +
          "[jaccardThreshold] [clusterAlgo: propagate|star] [scrubPii: true|false]")
      sys.exit(1)
    }
    val spark = graft.GraftSession.create()
    val code =
      try {
        val docs = spark.read.parquet(args(0))
        val r = run(spark, docs, args(1),
          args.lift(2).map(_.toDouble).getOrElse(0.5),
          args.lift(3).map(_.toDouble).getOrElse(0.5),
          inputBytes = Sinks.pathSize(args(0)),
          clusterAlgo = args.lift(4).getOrElse("propagate"),
          scrubPii = args.lift(5).exists(_.toBoolean))
        println(s"Curated ${r.input} -> ${r.afterNearDup} docs (${r.outputPath})")
        0
      } catch {
        case e: Exception =>
          System.err.println(s"ERROR: curation failed: ${e.getMessage}")
          1
      } finally spark.stop()
    sys.exit(code)
  }

  /** Quality score (q41's oracle-verified formula): type-token ratio
    * weighted against stopword density. */
  def qualityScore(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val toks = TA.tokens(text)
    val ttr = TA.typeTokenRatio(toks)
    val stop = (TA.wordOccurrences(text, "the") + TA.wordOccurrences(text, "a"))
      .cast(DoubleType) / size(toks)
    ttr * lit(0.7) + (lit(1.0) - stop) * lit(0.3)
  }

  /** `clusterAlgo`: "propagate" (default — near-dup graphs are clique-ish,
    * diameter 1-2) or "star" ([[Dedup.dupClustersStar]]'s O(log n) rounds
    * for corpora whose duplicate chains run long — transcripts, crawls). */
  def run(spark: SparkSession, docs: DataFrame, outDir: String,
      minQuality: Double = 0.5, jaccardThreshold: Double = 0.5,
      inputBytes: Long = 0L, clusterAlgo: String = "propagate",
      scrubPii: Boolean = false): Result = {
    // resolve the algorithm up front — the single validation site, and it
    // fails fast: a typo'd name must not burn three corpus scans (the
    // counts below) before stage 3 rejects it
    val clusterFn: (DataFrame, DataFrame) => DataFrame = clusterAlgo match {
      case "propagate" => Dedup.dupClusters(_, _)
      case "star"      => Dedup.dupClustersStar(_, _)
      case other => throw new IllegalArgumentException(
        s"clusterAlgo must be 'propagate' or 'star', got '$other'")
    }
    val input = docs.count()

    // stage 0 (optional): PII scrub — BEFORE scoring/dedup so placeholders
    // are what every later stage (and the output) sees; row-local, free of
    // shuffles, so it fuses into stage 1's scan
    val source =
      if (scrubPii) docs.withColumn("text", TA.scrubPii(col("text")))
      else docs

    // stage 1: quality floor
    val quality = source
      .withColumn("quality", qualityScore(col("text")))
      .filter(col("quality") >= minQuality)
    val nQuality = quality.count()

    // stage 2: exact dedup — smallest doc_id survives per identical text
    val exact = quality
      .withColumn("rn",
        row_number().over(Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
      .filter(col("rn") === 1).drop("rn")
    val nExact = exact.count()

    // stage 3: near-dup collapse — one canonical doc per Jaccard cluster
    // (the cluster label IS the surviving doc_id, so keep label == id)
    val pairs = Dedup.jaccardPairsPrefixHash(exact, jaccardThreshold)
      .select(col("doc_a"), col("doc_b"))
    val clusters = clusterFn(exact, pairs)
    val canonical = exact.join(clusters, "doc_id")
      .filter(col("doc_id") === col("cluster")).drop("cluster")

    // stage 4: deterministic content-hash split, written partition-pruned
    val out = s"$outDir/curated.parquet"
    val withSplit = canonical.withColumn("split",
      Sampling.splitAssign(col("text"),
        Seq("train" -> 0.8, "val" -> 0.9, "test" -> 1.0)))
    Sinks.partitionedParquet(withSplit, out, Seq("split"))

    val nFinal = spark.read.parquet(out).count()
    Sinks.statsSidecar(s"$outDir/curate-stats.json", nFinal, inputBytes,
      Sinks.pathSize(out))
    Result(input, nQuality, nExact, nFinal, out)
  }
}
