package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic content-hash sampling and splits for training-data
  * pipelines.
  *
  * All selection is by comparing the lowercase-hex md5 of a key column
  * against fixed hex thresholds: the decision is a pure row-local function
  * of the data (reproducible across runs, engines, partitionings, and
  * cluster sizes — unlike `df.sample`, whose output depends on partition
  * layout and seed plumbing). Every operator is a scan-only projection or
  * filter: no shuffle, fully codegen'd, trivially 100 TB-scalable.
  *
  * A hex threshold string encodes fraction f as its base-16 expansion
  * ("cccccccc" ≈ 0.8); md5 is uniform, so P[md5(key) < t] = f to ~2^-32
  * with an 8-digit threshold.
  */
object Sampling {

  /** Lowercase hex md5 of a string column — the sampling key. */
  def hashKey(c: Column): Column = md5(c.cast("binary"))

  /** Hex threshold with 8 fractional hex digits for a fraction in [0,1]. */
  def hexThreshold(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction")
    val scaled = math.round(fraction * (1L << 32)).min(1L << 32)
    if (scaled == (1L << 32)) "g" // > any hex digit: keeps everything
    else f"$scaled%08x"
  }

  /** Keep ~`fraction` of rows, chosen deterministically by md5(key). */
  def hashSample(df: DataFrame, key: Column, fraction: Double): DataFrame =
    df.filter(hashKey(key) < lit(hexThreshold(fraction)))

  /** Assign each row a named split by md5(key) range: `cuts` are the
    * cumulative upper fractions, e.g. train/val/test 80/10/10 =
    * Seq("train" -> 0.8, "val" -> 0.9, "test" -> 1.0). A row's split is
    * stable under re-runs and corpus growth (a doc never migrates between
    * splits unless its content changes). */
  def splitAssign(key: Column, cuts: Seq[(String, Double)]): Column = {
    require(cuts.nonEmpty && cuts.last._2 >= 1.0, "cuts must end at 1.0")
    val k = hashKey(key)
    cuts.init.foldRight(lit(cuts.last._1): Column) { case ((name, cut), rest) =>
      when(k < lit(hexThreshold(cut)), lit(name)).otherwise(rest)
    }
  }

  /** The per-source sampling fractions that mix a corpus DOWN to a target
    * source distribution: the largest total N with share(s) = weights(s)
    * is N = min_s count_s / w_s (the scarcest source binds), and source s
    * then keeps fraction N·w_s / count_s of its rows. Pure driver
    * arithmetic over the per-source counts (a |sources|-row aggregate). */
  def mixFractions(counts: Map[String, Long],
      weights: Map[String, Double]): Map[String, Double] = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "mix weights must be positive")
    weights.keys.foreach(s => require(counts.getOrElse(s, 0L) > 0L,
      s"mix source '$s' has no rows"))
    val n = weights.map { case (s, w) => counts(s) / w }.min
    weights.map { case (s, w) => s -> math.min(1.0, n * w / counts(s)) }
  }

  /** Deterministic DOWN-SAMPLING to a target source mix: keep only the
    * weighted sources, each hash-sampled at its [[mixFractions]] fraction,
    * so the surviving corpus approximates share(s) = weights(s) with the
    * scarcest source kept whole. The mixing step of a pretraining data
    * recipe ("40% web, 30% books, …"), as one scan-only filter: the
    * per-source thresholds are plan literals (a when-chain over
    * |sources| branches), selection is the same md5-threshold rule as
    * [[hashSample]] — reproducible across runs, engines, and cluster
    * sizes, and a source's kept-set only shrinks/grows monotonically if
    * its weight changes. One |sources|-row aggregate runs driver-side
    * first; everything else is the scan. */
  def mixToWeights(df: DataFrame, source: Column, key: Column,
      weights: Map[String, Double]): DataFrame = {
    // NULL sources are unlisted by definition — exclude them before the
    // count so the driver-side getString never sees a null group key
    val counts = df.filter(source.isNotNull)
      .groupBy(source.as("src")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fractions = mixFractions(counts, weights)
    val threshold = fractions.toSeq.sortBy(_._1)
      .foldLeft(lit(null).cast("string")) { case (acc, (s, f)) =>
        when(source === s, lit(hexThreshold(f))).otherwise(acc)
      }
    df.filter(hashKey(key) < threshold) // null threshold (unlisted source) drops the row
  }

  /** The deterministic per-row order key stratified sampling ranks by: the
    * first 13 hex digits (52 bits — exactly double-representable, so the
    * double comparison loses nothing) of md5(key), as a double. Uniform,
    * content-derived, engine-portable: any engine that can md5 reproduces
    * the same sample. */
  def orderKey53(key: Column): Column =
    conv(substring(hashKey(key), 1, 13), 16, 10).cast("double")

  /** Deterministic STRATIFIED sample: up to `n` rows per stratum, chosen
    * by ascending [[orderKey53]] (ties → smaller id), emitted as
    * (stratum, sample_rank, id). Rows with a NULL key are excluded up
    * front — a row with no content to order by has no defined sample
    * position, and making the exclusion explicit keeps every engine's
    * NULL-ordering convention (NULLS FIRST windows, NULLS LAST sorts,
    * aggregate null-skipping) out of the contract.
    *
    * "Sample 10k docs per language/source" is the quota-balancing step a
    * mixing pipeline runs ahead of training. A per-stratum `row_number`
    * window would shuffle the WHOLE corpus into as few partitions as there
    * are strata (languages: a handful — extreme skew at 100 TB); the
    * [[graft.functions.TopKAgg]] aggregate keeps an n-element buffer per
    * stratum on the map side instead, so the one shuffle carries
    * partitions × strata × n rows and the scan stays embarrassingly
    * parallel — the same shape as the kNN join. */
  def stratifiedSample(df: DataFrame, stratum: Column, id: Column,
      key: Column, n: Int): DataFrame =
    df.filter(key.isNotNull)
      .select(stratum.as("stratum"), id.as("id"),
        // topk keeps the HIGHEST scores: negate so the smallest order keys
        // (and, on 52-bit-prefix collisions, the smaller id) win
        (-orderKey53(key)).as("neg_key"))
      .groupBy(col("stratum"))
      .agg(graft.functions.TopKAgg.topk(col("neg_key"), col("id"), n).as("picks"))
      .select(col("stratum"), posexplode(col("picks")).as(Seq("pos", "id")))
      .select(col("stratum"), (col("pos") + 1).cast("int").as("sample_rank"),
        col("id"))

  /** Deterministic WEIGHTED sample (Efraimidis–Spirakis A-ES): up to `n`
    * rows per stratum with inclusion probability proportional to
    * `weight` — the quality-weighted subsampling step of corpus curation
    * ("keep 10k docs per source, preferring long/high-quality ones"),
    * reproducible from content alone like every sampler here.
    *
    * A-ES ranks rows by u^(1/w) descending (u uniform per row); this
    * implementation ranks by the order-equivalent −ln(u)/w ASCENDING,
    * quantized to integer nano-units so the cross-engine contract is the
    * usual one-libm-call-then-round (q93 discipline). u is EXACT dyadic:
    * (k₅₂ + ½) / 2⁵², with k₅₂ the [[orderKey53]] 52-bit md5 prefix —
    * the add and the power-of-two division are lossless in doubles, so
    * both engines feed ln the identical value.
    *
    * Same map-side-TopKAgg shape as [[stratifiedSample]]: no per-stratum
    * window over the corpus, one shuffle of partitions × strata × n
    * buffered rows.
    *
    * Weight range: the nano-quantized key stays exactly representable in
    * the ranking double while |key| < 2⁵³, i.e. weights ≳ 4·10⁻⁷ (−ln u ≤
    * 36 · 10⁹ nano-units). Rescale tiny weights (the selection is
    * scale-invariant: A-ES only uses weight RATIOS) rather than feeding
    * sub-micro values. */
  def weightedSample(df: DataFrame, stratum: Column, id: Column,
      key: Column, weight: Column, n: Int): DataFrame = {
    val u = (orderKey53(key) + lit(0.5)) / lit(4503599627370496.0) // 2^52
    val esKey = round((lit(-1.0) * log(u)) / weight * lit(1e9)).cast("long")
    df.filter(key.isNotNull && weight > 0)
      .select(stratum.as("stratum"), id.as("id"),
        (-esKey).cast("double").as("neg_key")) // smallest −ln(u)/w wins
      .groupBy(col("stratum"))
      .agg(graft.functions.TopKAgg.topk(col("neg_key"), col("id"), n).as("picks"))
      .select(col("stratum"), posexplode(col("picks")).as(Seq("pos", "id")))
      .select(col("stratum"), (col("pos") + 1).cast("int").as("sample_rank"),
        col("id"))
  }
}
