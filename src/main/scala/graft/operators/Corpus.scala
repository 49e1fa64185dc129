package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

import graft.operators.{TextAnalysis => TA}

/** Corpus-level analytics and transforms for training-data pipelines:
  * n-gram frequency statistics, cross-source vocabulary overlap,
  * document-frequency-capped stopword scrubbing, and context-window token
  * chunking. Everything here is either scan-only (chunking, and the scrub
  * once its small hot-set is built) or one partial-aggregated shuffle of
  * the token/shingle relation — the shapes that survive a 100 TB corpus.
  */
object Corpus {

  /** Top-`k` 3-gram shingles corpus-wide by occurrence count, with the
    * number of distinct documents containing each (`n_docs`).
    *
    * Two-phase aggregation instead of `countDistinct`: the first groupBy
    * on (shingle, doc_id) collapses per-document repeats WITH map-side
    * partial aggregation, so the wide shuffle carries one row per
    * (shingle, doc) incidence, and the second groupBy — already tiny —
    * derives both totals. `countDistinct(doc_id)` would plan an Expand
    * (2× the exploded relation) to share one shuffle; at corpus scale two
    * small shuffles beat one doubled one. The final total order
    * (count desc, shingle asc) is deterministic, so the LIMIT cutoff is
    * too; Spark plans it as TakeOrderedAndProject (no global sort). */
  def ngramTopK(docs: DataFrame, k: Int): DataFrame =
    // tokens in their OWN projection: shingles3's transform dereferences
    // the token array ~3× per shingle, and inlined the regex split would
    // re-run per reference (the docSetsLocal pitfall — measured ~7× the
    // stage). CollapseProject keeps multi-referenced non-cheap
    // projections apart, so the split runs once per row.
    docs.select(col("doc_id"), TA.tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(TA.shingles3(col("toks"))).as("shingle"))
      .groupBy(col("shingle"), col("doc_id"))
      .agg(count(lit(1)).as("n_in_doc"))
      .groupBy(col("shingle"))
      .agg(sum(col("n_in_doc")).as("n_occurrences"),
        count(lit(1)).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("shingle").asc)
      .limit(k)

  /** Pairwise Jaccard similarity of the distinct 3-gram-shingle
    * vocabularies of every two `source` groups (a < b), with intersection
    * and union sizes — the source-level cousin of document near-dup: which
    * corpora overlap enough that sampling weights should account for it.
    * Shingles, not unigram tokens: unigram vocabularies saturate (every
    * large corpus contains every common word, Jaccard → 1), while the
    * 3-gram space is sparse enough to discriminate at any scale.
    *
    * ONE corpus-sized shuffle: the incidence relation groups by shingle
    * with `collect_set(source)` deduping map-side (no separate distinct
    * pass, no self-join — a join would re-exchange both sides and emit
    * per-occurrence rows through a second shuffle). Each shingle's sorted
    * source list (≤ nSources elements) then expands to its a<b pairs
    * ROW-LOCALLY, and everything downstream aggregates relations bounded
    * by nSources², independent of corpus size. Pairs sharing zero
    * shingles are (correctly) absent. */
  def vocabOverlap(docs: DataFrame): DataFrame = {
    // two-stage projection as in ngramTopK: bind the token array to an
    // attribute before shingles3 multi-references it
    val byShingle = docs
      .select(col("source"), TA.tokens(col("text")).as("toks"))
      .select(col("source"),
        explode(array_distinct(TA.shingles3(col("toks")))).as("tok"))
      .groupBy(col("tok"))
      .agg(sort_array(collect_set(col("source"))).as("srcs"))
    // DIMENSION COLLAPSE before pair expansion: distinct source-LISTS are
    // few (bounded by the source-set lattice actually realized, not by
    // shingle count — corpora share hot co-occurrence patterns), so
    // grouping shingles by their whole list first shrinks the pair
    // explode from |shingles|·pairs rows to |distinct lists|·pairs, and
    // every downstream count becomes a weighted sum
    val setCounts = byShingle.groupBy(col("srcs")).agg(count(lit(1)).as("cnt"))
    // per-source vocabulary sizes from the weighted lists
    val sizes = setCounts.select(explode(col("srcs")).as("source"), col("cnt"))
      .groupBy(col("source")).agg(sum(col("cnt")).as("n_vocab"))
    // ordered pairs from each sorted list: element i with every later one
    val pairsCol = flatten(transform(col("srcs"), (a, i) =>
      transform(slice(col("srcs"), i + lit(2), size(col("srcs"))),
        b => struct(a.as("source_a"), b.as("source_b")))))
    val common = setCounts
      .select(explode(pairsCol).as("p"), col("cnt"))
      .groupBy(col("p.source_a").as("source_a"), col("p.source_b").as("source_b"))
      .agg(sum(col("cnt")).as("n_common"))
    common
      .join(broadcast(sizes.select(col("source").as("source_a"), col("n_vocab").as("na"))),
        "source_a")
      .join(broadcast(sizes.select(col("source").as("source_b"), col("n_vocab").as("nb"))),
        "source_b")
      .select(col("source_a"), col("source_b"), col("n_common"),
        (col("na") + col("nb") - col("n_common")).as("n_union"),
        (col("n_common").cast(DoubleType) /
          (col("na") + col("nb") - col("n_common"))).as("jaccard"))
  }

  /** Remove every token whose document frequency is ≥ `minDfFraction` of
    * the corpus from every document, preserving the order of the survivors
    * (C4-style corpus-adaptive stopword scrubbing).
    *
    * The hot set is SMALL BY CONSTRUCTION: a token qualifies only if it
    * appears in ≥ f·N documents, and with D distinct tokens per doc on
    * average there are at most D/f such tokens — independent of corpus
    * size. So the plan computes df with one partial-aggregated shuffle of
    * the distinct-token relation, closes the hot set against the corpus
    * row count via a 1-row cross join (no driver action, the plan stays
    * lazy), collapses it to ONE array row, and broadcast-cross-joins that
    * row back onto the corpus where the actual scrub is a row-local array
    * filter. Nothing per-document ever shuffles. */
  def scrubHotWords(docs: DataFrame, minDfFraction: Double): DataFrame = {
    val total = docs.agg(count(lit(1)).as("n_total"))
    val hot = docs
      .select(explode(array_distinct(TA.tokens(col("text")))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .join(total)
      .filter(col("df").cast(DoubleType) >= lit(minDfFraction) * col("n_total"))
    // sort_array: the membership test is order-independent, but a
    // deterministic array makes plans and debugging stable
    val hotRow = hot.agg(sort_array(collect_list(col("tok"))).as("hot_toks"))
    docs
      .crossJoin(broadcast(hotRow))
      .select(col("doc_id"), TA.tokens(col("text")).as("toks"), col("hot_toks"))
      .select(col("doc_id"), col("toks"),
        filter(col("toks"), t => not(array_contains(col("hot_toks"), t))).as("kept"))
      .select(col("doc_id"),
        size(col("toks")).as("n_tokens"),
        size(col("kept")).as("n_kept"),
        array_join(col("kept"), " ").as("scrubbed"))
  }

  /** Frequency-ranked unigram vocabulary: (tok, n_occurrences, token_id)
    * with dense 0-based ids by (count desc, token asc) — the
    * tokenizer-prep step that turns corpus statistics into an id space.
    *
    * The corpus-wide work is ONE partial-aggregated shuffle of the token
    * relation; the ranking then runs over the minCount-SURVIVORS only — a
    * vocabulary is tens of thousands of rows regardless of corpus size
    * (Heaps' law + the count floor), so the default single-partition
    * ranking sort (`rankPartitions = 1`) is bounded.
    *
    * For very large vocabularies (low minCount, shingle/BPE token spaces),
    * pass `rankPartitions = P > 1`: the survivors are RANGE-partitioned on
    * the ranking key, ranked per partition (each sort touches ~1/P of the
    * vocab), and per-partition offsets — a P-row relation — convert local
    * ranks to the same global dense ids. The two paths produce IDENTICAL
    * output: the ranking key (count desc, tok asc) is total (tok is
    * unique), so ids don't depend on where range boundaries land. The
    * survivor relation is localCheckpoint'ed in this path so the
    * corpus-sized explode+aggregate runs once, not once per downstream
    * reference. */
  def vocabulary(docs: DataFrame, minCount: Long,
      rankPartitions: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(rankPartitions >= 1, s"rankPartitions=$rankPartitions")
    val counts = docs.select(explode(TA.tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n_occurrences"))
      .filter(col("n_occurrences") >= minCount)
    val ord = Seq(col("n_occurrences").desc, col("tok").asc)
    if (rankPartitions == 1)
      counts.select(col("tok"), col("n_occurrences"),
        (row_number().over(Window.orderBy(ord: _*)) - 1).as("token_id"))
    else {
      // explicit numPartitions pins the exchange (AQE won't coalesce it);
      // pid is stable once materialized, so ranks and offsets agree
      val parts = counts.repartitionByRange(rankPartitions, ord: _*)
        .withColumn("pid", spark_partition_id())
        .localCheckpoint()
      val local = parts.withColumn("lr",
        row_number().over(Window.partitionBy(col("pid")).orderBy(ord: _*)))
      // offset(p) = rows in earlier partitions; the only single-partition
      // window left runs over P rows, not the vocabulary
      val offsets = parts.groupBy(col("pid")).agg(count(lit(1)).as("cnt"))
        .select(col("pid"), (sum(col("cnt")).over(Window.orderBy(col("pid")))
          - col("cnt")).as("offset"))
      local.join(broadcast(offsets), Seq("pid"))
        .select(col("tok"), col("n_occurrences"),
          (col("lr") - 1 + col("offset")).cast(IntegerType).as("token_id"))
    }
  }

  /** Encode every document as (doc_id, pos, token_id) under a vocabulary,
    * out-of-vocabulary tokens → −1. The vocab side is broadcast (small by
    * the [[vocabulary]] bound), so the corpus side is scan + explode +
    * broadcast-hash-join — no corpus-sized shuffle at any scale. `pos` is
    * 1-based. */
  def encodeTokens(docs: DataFrame, vocab: DataFrame): DataFrame =
    docs.select(col("doc_id"), posexplode(TA.tokens(col("text"))).as(Seq("pos", "tok")))
      .join(broadcast(vocab.select(col("tok"), col("token_id"))), Seq("tok"), "left")
      .select(col("doc_id"), (col("pos") + 1).as("pos"),
        coalesce(col("token_id"), lit(-1)).as("token_id"))

  /** Split each document's token sequence into context windows of at most
    * `window` tokens starting every `stride` tokens (overlap = window −
    * stride), the chunking step in front of tokenizer/packing in a
    * training pipeline. Chunk starts are 1, 1+s, 1+2s, …; the count
    * 1 + ⌈max(n−w, 0)/s⌉ is exactly enough that the last chunk reaches the
    * final token (it may be shorter than `window`; with stride ≤ window
    * every token is covered). Entirely row-local — a scan-only generate,
    * no shuffle at any scale. */
  def chunkTokens(docs: DataFrame, window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val n = size(col("toks"))
    val nChunks = when(n <= window, lit(1))
      .otherwise(ceil((n - lit(window)).cast(DoubleType) / lit(stride))
        .cast(IntegerType) + lit(1))
    docs
      .select(col("doc_id"), TA.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        posexplode(sequence(lit(0), nChunks - 1)).as(Seq("chunk_idx", "i")))
      .select(col("doc_id"), col("chunk_idx"),
        (col("i") * stride + 1).as("start_tok"),
        slice(col("toks"), col("i") * stride + 1, lit(window)).as("chunk"))
      .select(col("doc_id"), col("chunk_idx").cast(IntegerType).as("chunk_idx"),
        col("start_tok").cast(IntegerType).as("start_tok"),
        size(col("chunk")).as("n_chunk_tokens"),
        array_join(col("chunk"), " ").as("chunk_text"))
  }

  /** Top-`k` TF-IDF terms per source: which tokens are DISTINCTIVE of each
    * corpus slice, not merely frequent in it — the relevance/topicality
    * statistic behind quality filters ("does this source over-index on
    * boilerplate?") and mixture design. Output: (source, token, tf_total,
    * df, tfidf_1e6, rank) with rank 1..k by (score desc, token asc).
    *
    * Scoring: tfidf = tf_total(source, token) · ln(N / df), with N the
    * corpus document count and df the CORPUS-WIDE document frequency —
    * per-source tf against global idf, so a token every source repeats
    * scores ~0 everywhere. The score is emitted as integer MICROS
    * (`round(x·1e6)`), the same cross-engine contract as the cosine
    * queries: every arithmetic step (long→double promotion, one exact
    * division, `ln`, two multiplications, round-half-up) is evaluated in
    * the same order by any IEEE engine, and the top-k cutoff itself runs
    * on the rounded micros, so rank boundaries can't drift on a last-ulp
    * disagreement. (Micros stay exactly representable up to 2^53 —
    * tf_total·ln(N/df) < ~9e9 — beyond which widen the scale.)
    *
    * Shape at scale: shuffle 1 partial-aggregates the exploded token
    * relation to (source, doc, token) tf rows — in-document repeats
    * collapse map-side; shuffle 2 collapses that to the (source, token)
    * relation (vocab-bounded, Heaps' law); df then derives from the
    * aggregate — `sum` of per-source doc counts — NOT from a second pass
    * over the corpus, and the df join exchanges only vocab-sized
    * relations. N closes via a broadcast 1-row cross join (plan stays
    * lazy, no driver action).
    *
    * Ranking: `rankPartitions = 1` (default) ranks with one window
    * partitioned by source — fine while per-source vocabularies sort in
    * one task. For large vocabs pass P > 1: rows are RANGE-partitioned on
    * the full (source, score, token) ranking key — a big source spreads
    * across MANY partitions, so no per-source executor hot spot — ranked
    * locally, pruned to local-rank ≤ k (global rank ≥ local rank, so
    * nothing prunable can reach the top k), and per-(partition, source)
    * offsets — a P×sources relation — convert local to global ranks.
    * Both paths emit identical rows: the ranking key is total (token is
    * unique per source), so ranks don't depend on boundary placement. */
  def tfidfTopTerms(docs: DataFrame, k: Int,
      rankPartitions: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, s"k=$k")
    require(rankPartitions >= 1, s"rankPartitions=$rankPartitions")
    val total = docs.agg(count(lit(1)).cast(DoubleType).as("n_total"))
    val tf = docs
      .select(col("source"), col("doc_id"),
        explode(TA.tokens(col("text"))).as("token"))
      .groupBy(col("source"), col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val bySourceToken = tf.groupBy(col("source"), col("token"))
      .agg(sum(col("tf")).as("tf_total"), count(lit(1)).as("nd"))
    val dfRel = bySourceToken.groupBy(col("token"))
      .agg(sum(col("nd")).as("df"))
    val scored = bySourceToken.join(dfRel, Seq("token"))
      .crossJoin(broadcast(total))
      .select(col("source"), col("token"), col("tf_total"), col("df"),
        round(col("tf_total") * log(col("n_total") / col("df")) * lit(1e6))
          .cast(LongType).as("tfidf_1e6"))
    val ord = Seq(col("tfidf_1e6").desc, col("token").asc)
    val out = Seq(col("source"), col("token"), col("tf_total"), col("df"),
      col("tfidf_1e6"))
    if (rankPartitions == 1)
      scored.select(out :+ row_number().over(
          Window.partitionBy(col("source")).orderBy(ord: _*)).as("rank"): _*)
        .filter(col("rank") <= k)
    else {
      // explicit numPartitions pins the exchange (AQE won't coalesce it);
      // pid is stable once materialized, so ranks and offsets agree
      val parts = scored
        .repartitionByRange(rankPartitions, col("source") +: ord: _*)
        .withColumn("pid", spark_partition_id())
        .localCheckpoint()
      val local = parts.withColumn("lr", row_number().over(
          Window.partitionBy(col("pid"), col("source")).orderBy(ord: _*)))
        .filter(col("lr") <= k) // global rank >= local rank: safe prune
      val offsets = parts.groupBy(col("pid"), col("source"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("pid"), col("source"),
          (sum(col("cnt")).over(
            Window.partitionBy(col("source")).orderBy(col("pid")))
            - col("cnt")).as("offset"))
      local.join(broadcast(offsets), Seq("pid", "source"))
        .select(out :+ (col("lr") + col("offset")).cast(IntegerType)
          .as("rank"): _*)
        .filter(col("rank") <= k)
    }
  }
}
