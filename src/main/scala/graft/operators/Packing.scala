package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import TextAnalysis.tokens

/** Training-corpus layout operators: deterministic sharding and
  * token-budget sequence packing — the steps between a curated corpus and
  * a pretraining data loader.
  *
  * Scale design: neither operator imposes a GLOBAL order (a global
  * row_number would funnel the corpus through one partition). Documents
  * hash into shards (md5-derived, engine- and run-portable), and every
  * window below partitions BY SHARD, so the work distributes across
  * exactly nShards-many groups and the same plan runs on a 1000-executor
  * cluster with `shard` as the write-partition key. The within-shard
  * order (md5 of a seeded key, doc_id tiebreak) is a deterministic
  * pseudo-shuffle: reproducible across engines and runs, uncorrelated
  * with corpus order — the property a training shuffle needs.
  */
object Packing {

  /** The seeded per-doc shuffle key: md5 of "seed:doc_id". Using the hash
    * BYTES (hex string) keeps it portable — every engine derives the same
    * md5 from the same string. */
  private def shuffleKey(seed: Long): Column =
    md5(concat(lit(s"$seed:"), col("doc_id").cast(StringType)))

  /** (shard, key) column pair for a given layout: the shard is the
    * first-7-hex-chars slice of the key (28 bits — fits a signed int
    * exactly, same value in any engine that can parse hex) mod nShards. */
  private def shardCols(nShards: Int, seed: Long): (Column, Column) = {
    val key = shuffleKey(seed)
    val shard = (conv(substring(key, 1, 7), 16, 10).cast(LongType) % nShards)
      .cast(IntegerType)
    (shard, key)
  }

  /** Deterministic shard + position assignment: each doc lands in one of
    * `nShards` shards at a stable position (pseudo-random within-shard
    * order). */
  def shardAssign(docs: DataFrame, nShards: Int, seed: Long): DataFrame = {
    require(nShards >= 1, s"nShards=$nShards must be >= 1")
    val (shard, key) = shardCols(nShards, seed)
    docs
      .select(col("doc_id"), shard.as("shard"), key.as("skey"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("skey"), col("doc_id"))))
      .select(col("doc_id"), col("shard"), col("pos"))
  }

  /** Contiguous token-budget packing: walk each shard in its
    * deterministic order, accumulate whitespace-token counts, and cut a
    * pack boundary each time the running sum crosses a multiple of
    * `tokenBudget`: `bin = ceil(cumsum / budget)`, i.e. bin k holds the
    * docs whose running sum lands in ((k−1)·budget, k·budget]. Every pack
    * carries ≈budget tokens; the doc that pushes the running sum past a
    * multiple of the budget CLOSES its pack (it is the pack's last,
    * possibly overshooting doc), and a doc bigger than the whole budget
    * simply closes its pack immediately — followers start accumulating in
    * the next one. The binning is ONE window pass — unlike true greedy
    * first-fit, which needs a stateful scan — and exactly reproducible
    * from (corpus, seed, budget) alone, which is what a resumable
    * pretraining loader needs. Output: (doc_id, shard, pos, n_tokens,
    * bin). */
  def packSequences(docs: DataFrame, nShards: Int, seed: Long,
      tokenBudget: Int): DataFrame =
    // token counts ride the same projection as the shuffle key inside
    // packByCounts: one scan, one shuffle (the shard window) — not a
    // second scan + doc_id join
    packByCounts(docs.select(col("doc_id"),
        size(tokens(col("text"))).cast(LongType).as("n_tokens")),
      nShards, seed, tokenBudget)

  /** [[packSequences]] generalized to EXTERNAL per-doc token counts —
    * the packing a real loader runs once a tokenizer exists: `counts` is
    * (doc_id, n_tokens) with counts from whatever tokenizer is in force
    * (e.g. learned-BPE lengths via
    * [[Corpus.bpeDocTokenCounts]]), binned under the identical
    * deterministic shard order and one-window cumulative rule. */
  def packByCounts(counts: DataFrame, nShards: Int, seed: Long,
      tokenBudget: Int): DataFrame = {
    require(nShards >= 1, s"nShards=$nShards must be >= 1")
    require(tokenBudget >= 1, s"tokenBudget=$tokenBudget must be >= 1")
    val (shard, key) = shardCols(nShards, seed)
    counts
      .select(col("doc_id"), shard.as("shard"), key.as("skey"),
        col("n_tokens").cast(LongType).as("n_tokens"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("skey"), col("doc_id"))))
      .withColumn("cum", sum(col("n_tokens")).over(
        Window.partitionBy(col("shard")).orderBy(col("skey"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("doc_id"), col("shard"), col("pos"), col("n_tokens"),
        greatest(ceil(col("cum").cast(DoubleType) / tokenBudget), lit(1))
          .cast(IntegerType).as("bin"))
  }
}
