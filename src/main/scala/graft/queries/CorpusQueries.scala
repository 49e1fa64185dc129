package graft.queries

import graft.Tables
import graft.operators.Corpus

/** Corpus-level analytics and transform queries over the `documents`
  * table: n-gram frequency stats, cross-source vocabulary overlap,
  * df-capped stopword scrubbing, and context-window chunking. Oracle SQL
  * is DuckDB dialect, sharing [[TextQueries.sqlToks]] /
  * [[TextQueries.sqlShingles]] so the tokenizer contract stays single-
  * sourced. */
object CorpusQueries {

  private val sqlToks = TextQueries.sqlToks
  private val sqlShingles = TextQueries.sqlShingles

  /** Corpus-wide top-k 3-grams with occurrence and document counts. */
  val q66 = Q(
    "q66_ngram_topk",
    (spark, dir) => Corpus.ngramTopK(Tables.load(spark, dir, "documents"), 20),
    Some(s"""SELECT shingle, CAST(SUM(n_in_doc) AS BIGINT) AS n_occurrences,
        COUNT(*) AS n_docs
      FROM (SELECT doc_id, s AS shingle, COUNT(*) AS n_in_doc
            FROM (SELECT doc_id, unnest($sqlShingles) AS s FROM documents)
            GROUP BY doc_id, s)
      GROUP BY shingle
      ORDER BY n_occurrences DESC, shingle ASC
      LIMIT 20""")
  )

  /** Pairwise source-vocabulary (3-gram) Jaccard overlap. */
  val q67 = Q(
    "q67_source_overlap",
    (spark, dir) => Corpus.vocabOverlap(Tables.load(spark, dir, "documents")),
    Some(s"""WITH vocab AS (
        SELECT DISTINCT source, unnest(list_distinct($sqlShingles)) AS s
        FROM documents),
      sizes AS (SELECT source, COUNT(*) AS n_vocab FROM vocab GROUP BY source),
      common AS (
        SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_common
        FROM vocab a JOIN vocab b ON a.s = b.s AND a.source < b.source
        GROUP BY 1, 2)
      SELECT source_a, source_b, n_common,
        sa.n_vocab + sb.n_vocab - n_common AS n_union,
        CAST(n_common AS DOUBLE) / (sa.n_vocab + sb.n_vocab - n_common) AS jaccard
      FROM common
      JOIN sizes sa ON sa.source = source_a
      JOIN sizes sb ON sb.source = source_b""")
  )

  /** Corpus-adaptive stopword scrub: drop tokens present in ≥ 78.6% of
    * documents. The cap sits inside the synthetic corpus's df spread
    * (not at a cliff where the hot set is all-or-nothing), so the check
    * exercises a real split; both engines evaluate the same
    * integer-df ≥ double-threshold comparison, so the boundary is
    * deterministic. COALESCE on the oracle: DuckDB's array_to_string
    * returns NULL for an empty list where Spark's array_join returns
    * ''. */
  val q68 = Q(
    "q68_stopword_scrub",
    (spark, dir) =>
      Corpus.scrubHotWords(Tables.load(spark, dir, "documents"), 0.786),
    Some(s"""WITH dfx AS (
        SELECT tok, COUNT(*) AS df
        FROM (SELECT DISTINCT doc_id, tok
              FROM (SELECT doc_id, unnest($sqlToks) AS tok FROM documents))
        GROUP BY tok),
      total AS (SELECT COUNT(*) AS n_total FROM documents),
      hotl AS (SELECT list_sort(list(tok)) AS hot_toks FROM dfx, total
               WHERE CAST(df AS DOUBLE) >= 0.786 * n_total)
      SELECT doc_id, CAST(len(toks) AS INTEGER) AS n_tokens,
        CAST(len(kept) AS INTEGER) AS n_kept,
        COALESCE(array_to_string(kept, ' '), '') AS scrubbed
      FROM (SELECT doc_id, $sqlToks AS toks,
              list_filter($sqlToks, t -> NOT list_contains(hot_toks, t)) AS kept
            FROM documents, hotl)""")
  )

  /** Context-window chunking: 64-token windows every 48 tokens. */
  val q69 = Q(
    "q69_token_chunks",
    (spark, dir) =>
      Corpus.chunkTokens(Tables.load(spark, dir, "documents"), 64, 48),
    Some(s"""SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
        CAST(i*48 + 1 AS INTEGER) AS start_tok,
        CAST(len(toks[i*48 + 1 : i*48 + 64]) AS INTEGER) AS n_chunk_tokens,
        array_to_string(toks[i*48 + 1 : i*48 + 64], ' ') AS chunk_text
      FROM (SELECT doc_id, toks,
              unnest(range(CASE WHEN len(toks) <= 64 THEN 1
                ELSE CAST(ceil((len(toks) - 64) / 48.0) AS INTEGER) + 1 END)) AS i
            FROM (SELECT doc_id, $sqlToks AS toks FROM documents))""")
  )

  /** Vocabulary build + token-id encoding ([[Corpus.vocabulary]] at
    * minCount=5 feeding [[Corpus.encodeTokens]]): every document as
    * (doc_id, pos, token_id), OOV → −1 — the tokenizer-prep chain that
    * turns corpus statistics into the id stream a trainer consumes. The
    * oracle rebuilds the same frequency-ranked ids ((count desc, token
    * asc), dense 0-based) and re-encodes, so id assignment AND the
    * per-position encoding are both hash-checked. Runs the DEFAULT
    * single-window ranking path — the recorded bench number is the path
    * a user gets; the range-partitioned large-vocab scale path is
    * hash-checked separately as [[q101]] (round-6 verdict item 3). */
  val q78 = Q(
    "q78_vocab_encode",
    (spark, dir) => {
      val docs = Tables.load(spark, dir, "documents")
      Corpus.encodeTokens(docs, Corpus.vocabulary(docs, 5L))
    },
    Some(s"""WITH t AS (
        SELECT doc_id, unnest($sqlToks) AS tok,
          unnest(generate_series(1, len($sqlToks))) AS pos
        FROM documents),
      v AS (SELECT tok, COUNT(*) AS n FROM t GROUP BY tok HAVING COUNT(*) >= 5),
      vid AS (SELECT tok,
          CAST(ROW_NUMBER() OVER (ORDER BY n DESC, tok) - 1 AS INTEGER) AS token_id
        FROM v)
      SELECT t.doc_id, CAST(t.pos AS INTEGER) AS pos,
        COALESCE(vid.token_id, -1) AS token_id
      FROM t LEFT JOIN vid USING (tok)""")
  )

  /** Heavy-hitter token counts through the Count-Min sketch
    * ([[graft.functions.CountMinAgg]]), hash-checked as a tolerance-band
    * contract (the q42 pattern): build the sketch in one pass, then for
    * the exact top-20 tokens emit whether the CMS estimate respects both
    * sketch guarantees — never below the exact count, and within 3·ε·N
    * above it. The oracle recomputes the exact top-20 in DuckDB and
    * states both verdicts hold; a broken sketch (bad merge, hash drift,
    * under-count) flips a boolean and fails the hash. At 100 TB this is
    * the frequency path when per-key exact counting is too wide: the
    * sketch is a fixed-size grid with map-side merge, and the exact pass
    * here exists only to verify it. */
  val q92 = Q(
    "q92_cms_heavy_hitters",
    (spark, dir) => {
      import org.apache.spark.sql.functions._
      import graft.functions.CountMinCols
      val eps = 0.0005
      val toks = Tables.load(spark, dir, "documents")
        .select(explode(graft.operators.TextAnalysis.tokens(col("text"))).as("tok"))
      val built = toks.agg(
        CountMinCols.countMinAgg(col("tok"), eps, 0.99, seed = 42),
        count(lit(1))).head()
      val sketch = lit(built.getAs[Array[Byte]](0))
      val band = math.ceil(3 * eps * built.getLong(1)).toLong
      toks.groupBy(col("tok"))
        .agg(count(lit(1)).as("n_exact"))
        .orderBy(desc("n_exact"), asc("tok"))
        .limit(20)
        .select(col("tok").as("token"), col("n_exact"),
          (CountMinCols.estimate(sketch, col("tok")) >= col("n_exact"))
            .as("cms_never_under"),
          (CountMinCols.estimate(sketch, col("tok")) <= col("n_exact") + lit(band))
            .as("cms_within_band"))
    },
    Some(s"""SELECT tok AS token, COUNT(*) AS n_exact,
        true AS cms_never_under, true AS cms_within_band
      FROM (SELECT unnest($sqlToks) AS tok FROM documents)
      GROUP BY tok ORDER BY n_exact DESC, token ASC LIMIT 20""")
  )

  /** Per-source top-15 TF-IDF terms ([[Corpus.tfidfTopTerms]]). The score
    * crosses engines as integer micros — the cosine-query contract:
    * identical promotion/division/ln/multiply/round order, and the top-k
    * cutoff itself compares rounded micros, so rank boundaries can't
    * drift on a last-ulp `ln` disagreement. Runs the DEFAULT
    * single-window ranking path; the range-partitioned scale path is
    * hash-checked separately as [[q102]]. */
  val q93 = Q(
    "q93_tfidf_top_terms",
    (spark, dir) => Corpus.tfidfTopTerms(
      Tables.load(spark, dir, "documents"), 15),
    Some(s"""WITH tf AS (
        SELECT source, doc_id, token, COUNT(*) AS tf
        FROM (SELECT source, doc_id, unnest($sqlToks) AS token FROM documents)
        GROUP BY 1, 2, 3),
      st AS (SELECT source, token, CAST(SUM(tf) AS BIGINT) AS tf_total,
               COUNT(*) AS nd
             FROM tf GROUP BY 1, 2),
      df AS (SELECT token, CAST(SUM(nd) AS BIGINT) AS df FROM st GROUP BY 1),
      sc AS (SELECT source, token, tf_total, df,
               CAST(ROUND(tf_total * ln(
                   (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents) / df)
                 * 1000000) AS BIGINT) AS tfidf_1e6
             FROM st JOIN df USING (token)),
      rk AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY source
                 ORDER BY tfidf_1e6 DESC, token ASC) AS INTEGER) AS rank
             FROM sc)
      SELECT source, token, tf_total, df, tfidf_1e6, rank
      FROM rk WHERE rank <= 15""")
  )

  /** [[q78]]'s pipeline on the RANGE-PARTITIONED vocabulary ranking path
    * (rankPartitions=4) — the large-vocab scale shape, where a single
    * global ROW_NUMBER window would funnel every surviving token through
    * one partition. Ids are contract-identical to the window path
    * (CorpusSpec proves the equality), so the SAME oracle hash-checks
    * both; declaring the paths as separate queries keeps each one's bench
    * number attributable (round-6 verdict item 3: the scale path pays an
    * eager localCheckpoint + 2 extra exchanges that lose at sf0.1 — a
    * price that must be visible, not silently folded into q78). */
  val q101 = Q(
    "q101_vocab_encode_ranged",
    (spark, dir) => {
      val docs = Tables.load(spark, dir, "documents")
      Corpus.encodeTokens(docs, Corpus.vocabulary(docs, 5L, rankPartitions = 4))
    },
    q78.oracle
  )

  /** [[q93]]'s TF-IDF top terms on the RANGE-PARTITIONED ranking path
    * (rankPartitions=4); same oracle, same path-equality contract as
    * [[q101]]. */
  val q102 = Q(
    "q102_tfidf_ranged",
    (spark, dir) => Corpus.tfidfTopTerms(
      Tables.load(spark, dir, "documents"), 15, rankPartitions = 4),
    q93.oracle
  )

  /** Corpus-trained bigram LM scoring ([[Corpus.bigramLogProb]]): per-doc
    * Laplace-smoothed log-probability totals. The oracle rebuilds the
    * identical model — BIGINT bigram/start counts, exact-division
    * probabilities, per-bigram round(ln·10⁶) integer micros (the q93
    * contract), BIGINT per-doc sums (HUGEINT pinned back) — so model
    * fitting AND scoring are both hash-checked. Sub-2-token docs appear
    * as (0, 0) via the left join on both sides. */
  val q106 = Q(
    "q106_bigram_logprob",
    (spark, dir) => Corpus.bigramLogProb(Tables.load(spark, dir, "documents")),
    Some(s"""WITH big AS (
        SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
        FROM (SELECT doc_id, toks,
                unnest(generate_series(1, len(toks) - 1)) AS i
              FROM (SELECT doc_id, $sqlToks AS toks FROM documents))),
      c12 AS (SELECT w1, w2, COUNT(*) AS n12 FROM big GROUP BY 1, 2),
      c1 AS (SELECT w1, CAST(SUM(n12) AS BIGINT) AS n1 FROM c12 GROUP BY 1),
      v AS (SELECT COUNT(DISTINCT tok) AS vocab
            FROM (SELECT unnest($sqlToks) AS tok FROM documents)),
      scored AS (SELECT b.doc_id,
          CAST(ROUND(ln((n12 + 1.0) / (n1 + vocab)) * 1000000) AS BIGINT) AS lp
        FROM big b JOIN c12 USING (w1, w2) JOIN c1 USING (w1), v),
      per_doc AS (SELECT doc_id, COUNT(*) AS n_bigrams,
          CAST(SUM(lp) AS BIGINT) AS logprob_micros
        FROM scored GROUP BY 1)
      SELECT d.doc_id,
        COALESCE(n_bigrams, CAST(0 AS BIGINT)) AS n_bigrams,
        COALESCE(logprob_micros, CAST(0 AS BIGINT)) AS logprob_micros
      FROM documents d LEFT JOIN per_doc USING (doc_id)""")
  )

  /** Pairwise source JS divergence ([[Corpus.sourceDivergence]]) in
    * integer micro-nats. The oracle mirrors the exact term algebra —
    * identical division/multiply/ln op order, ln 2 pinned as the same
    * double LITERAL on both sides (neither runtime's ln(2) call is
    * trusted), per-term rounding to micros, BIGINT pair sums (HUGEINT
    * pinned) — so the distribution fitting AND the divergence arithmetic
    * are hash-checked. All terms are ≥ 0 (log-sum inequality), so the
    * half-up vs half-away rounding modes cannot disagree. */
  val q108 = Q(
    "q108_source_divergence",
    (spark, dir) => Corpus.sourceDivergence(
      Tables.load(spark, dir, "documents")),
    Some(s"""WITH st AS (
        SELECT source, tok, COUNT(*) AS n
        FROM (SELECT source, unnest($sqlToks) AS tok FROM documents)
        GROUP BY 1, 2),
      tot AS (SELECT source, CAST(SUM(n) AS BIGINT) AS nt FROM st GROUP BY 1),
      pairs AS (SELECT a.source AS sa, a.nt AS na_t,
          b.source AS sb, b.nt AS nb_t
        FROM tot a, tot b WHERE a.source < b.source),
      aside AS (SELECT p.sa, p.sb, s.n AS na, p.na_t, t.n AS nb, p.nb_t
        FROM pairs p JOIN st s ON s.source = p.sa
        LEFT JOIN st t ON t.source = p.sb AND t.tok = s.tok),
      bonly AS (SELECT p.sa, p.sb, s.n AS nb, p.nb_t
        FROM pairs p JOIN st s ON s.source = p.sb
        WHERE NOT EXISTS (SELECT 1 FROM st t
          WHERE t.source = p.sa AND t.tok = s.tok)),
      terms AS (
        SELECT sa, sb, CASE WHEN nb IS NULL
          THEN CAST(ROUND(na / CAST(na_t AS DOUBLE) * 0.6931471805599453
            * 500000) AS BIGINT)
          ELSE CAST(ROUND((na / CAST(na_t AS DOUBLE)
              * ln(2 * (na / CAST(na_t AS DOUBLE))
                / (na / CAST(na_t AS DOUBLE) + nb / CAST(nb_t AS DOUBLE)))
            + nb / CAST(nb_t AS DOUBLE)
              * ln(2 * (nb / CAST(nb_t AS DOUBLE))
                / (na / CAST(na_t AS DOUBLE) + nb / CAST(nb_t AS DOUBLE))))
            * 500000) AS BIGINT) END AS t
        FROM aside
        UNION ALL
        SELECT sa, sb, CAST(ROUND(nb / CAST(nb_t AS DOUBLE)
          * 0.6931471805599453 * 500000) AS BIGINT)
        FROM bonly)
      SELECT sa AS source_a, sb AS source_b, COUNT(*) AS n_union,
        CAST(SUM(t) AS BIGINT) AS js_micros
      FROM terms GROUP BY 1, 2""")
  )

  /** Per-source document-length distribution
    * ([[graft.operators.Quantiles.exactGroupQuantiles]] over token
    * counts) — the curation report behind length filtering and packing
    * budgets. Exact nearest-rank picks on BIGINT counts: every output is
    * a length actually present, hash-checkable with no sketch tolerance.
    * The oracle mirrors the histogram + cumulative-rank construction
    * (window SUM pinned back from HUGEINT — the q82 lesson). */
  val q114 = Q(
    "q114_length_quantiles",
    (spark, dir) => {
      import org.apache.spark.sql.functions._
      graft.operators.Quantiles.exactGroupQuantiles(
        Tables.load(spark, dir, "documents")
          .select(col("source"),
            size(graft.operators.TextAnalysis.tokens(col("text")))
              .cast(org.apache.spark.sql.types.LongType).as("n_tokens")),
        "source", "n_tokens")
    },
    Some(s"""WITH v AS (SELECT source,
          CAST(len($sqlToks) AS BIGINT) AS n_tokens FROM documents),
      h AS (SELECT source, n_tokens, COUNT(*) AS c FROM v GROUP BY 1, 2),
      w AS (SELECT *,
          SUM(c) OVER (PARTITION BY source ORDER BY n_tokens) AS cum,
          SUM(c) OVER (PARTITION BY source) AS n
        FROM h)
      SELECT source, CAST(MAX(n) AS BIGINT) AS n,
        MIN(CASE WHEN cum >= ceil(0.25 * n) THEN n_tokens END) AS p25,
        MIN(CASE WHEN cum >= ceil(0.5 * n) THEN n_tokens END) AS p50,
        MIN(CASE WHEN cum >= ceil(0.75 * n) THEN n_tokens END) AS p75,
        MIN(CASE WHEN cum >= ceil(0.95 * n) THEN n_tokens END) AS p95
      FROM w GROUP BY 1""")
  )

  /** Per-source Zipf slope ([[Corpus.zipfSlope]]): OLS of ln(frequency)
    * on ln(rank) over each source's token frequency table. Ranks are
    * dense integers over the (count desc, token asc) total order; the
    * four OLS sums ride the DECIMAL(28,10) discipline; the slope is one
    * fixed op sequence with a NULLed degenerate denominator on both
    * sides. */
  val q117 = Q(
    "q117_zipf_slope",
    (spark, dir) => Corpus.zipfSlope(Tables.load(spark, dir, "documents")),
    Some(s"""WITH c AS (
        SELECT source, tok, COUNT(*) AS n
        FROM (SELECT source, unnest($sqlToks) AS tok FROM documents)
        GROUP BY 1, 2),
      pts AS (SELECT source,
          ln(CAST(ROW_NUMBER() OVER (PARTITION BY source
              ORDER BY n DESC, tok ASC) AS DOUBLE)) AS x,
          ln(CAST(n AS DOUBLE)) AS y
        FROM c),
      s AS (SELECT source, COUNT(*) AS n_points,
          ${Exact.sqlSum("x")} AS sx, ${Exact.sqlSum("y")} AS sy,
          ${Exact.sqlSum("x * y")} AS sxy, ${Exact.sqlSum("x * x")} AS sxx
        FROM pts GROUP BY 1)
      SELECT source, n_points,
        (n_points * sxy - sx * sy) /
          NULLIF(n_points * sxx - sx * sx, 0) AS zipf_slope
      FROM s""")
  )

  /** The FROZEN vocabulary: built from batch 1 (even doc_ids) only,
    * persisted as parquet once per sf dir. Staging — q125 measures the
    * apply side, which must never recount batch 1. */
  private val stagedVocab =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private def frozenVocabDir(spark: org.apache.spark.sql.SparkSession,
      dir: String): String =
    stagedVocab.getOrElseUpdate(dir, {
      import org.apache.spark.sql.functions.col
      val t = ParityQueries.scratchDir("graft-frozen-vocab")
      Corpus.vocabulary(
        Tables.load(spark, dir, "documents").filter(col("doc_id") % 2 === 0),
        minCount = 5L)
        .write.mode("overwrite").parquet(t)
      t
    })

  /** Frozen-vocabulary incremental encode — the tokenizer contract of a
    * training pipeline: the vocabulary is FROZEN when the tokenizer is
    * trained (batch 1) and every later batch encodes against it
    * unchanged, unseen tokens mapping to the OOV id (−1). Batch 2 (odd
    * doc_ids) encodes against batch 1's persisted [[Corpus.vocabulary]]
    * relation via the broadcast [[Corpus.encodeTokens]] join; batch 1 is
    * never re-tokenized or recounted (the q118/q124 persisted-artifact
    * contract, for the vocab). The oracle rebuilds the batch-1 ranking
    * and the batch-2 encode from scratch — id drift, OOV mishandling,
    * or vocab contamination by batch 2 all hash-mismatch. */
  val q125 = Q(
    "q125_frozen_vocab_encode",
    (spark, dir) => {
      import org.apache.spark.sql.functions.col
      Corpus.encodeTokens(
        Tables.load(spark, dir, "documents").filter(col("doc_id") % 2 =!= 0),
        spark.read.parquet(frozenVocabDir(spark, dir)))
    },
    Some(s"""WITH t AS (
        SELECT doc_id, unnest($sqlToks) AS tok,
          unnest(generate_series(1, len($sqlToks))) AS pos
        FROM documents),
      v AS (SELECT tok, COUNT(*) AS n FROM t
            WHERE doc_id % 2 = 0 GROUP BY tok HAVING COUNT(*) >= 5),
      vid AS (SELECT tok,
          CAST(ROW_NUMBER() OVER (ORDER BY n DESC, tok) - 1 AS INTEGER) AS token_id
        FROM v)
      SELECT t.doc_id, CAST(t.pos AS INTEGER) AS pos,
        COALESCE(vid.token_id, -1) AS token_id
      FROM t LEFT JOIN vid USING (tok)
      WHERE t.doc_id % 2 = 1""")
  )

  /** Query-term set for the BM25 / retrieval family: fixed literals with
    * a real df spread in the synthetic corpus, shared by the Spark side
    * and the generated oracle so the contract can't drift. */
  private[queries] val bm25Terms = Seq("spark", "hash", "vector", "stream")

  /** Okapi BM25 top-k retrieval ([[Corpus.bm25TopK]]) for a fixed query
    * bag. Oracle is GENERATED from the same term list: one per-document
    * conditional aggregate (dl + per-term tf columns), a 1-row stats CTE
    * (N, Σdl, per-term df), and per-term contributions quantized to
    * integer micros before the cross-term sum — the exact expression tree
    * the Spark side evaluates, so scores hash-match bit-for-bit. */
  /** The BM25 ranking as a reusable oracle CTE chain ending in `bmrk`
    * (doc_id, source, n_tokens, n_terms, bm25_1e6, rank) — q131 selects
    * from it directly; the hybrid-search oracle (q132) prunes it to a
    * retriever list and fuses it with the cosine ranking. */
  private[queries] val bm25RankedCtes: String = {
    val tfCols = bm25Terms.map(t =>
      s"SUM(CASE WHEN token = '$t' THEN 1 ELSE 0 END) AS tf_$t").mkString(",\n          ")
    val dfCols = bm25Terms.map(t =>
      s"SUM(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS df_$t").mkString(",\n          ")
    val contribs = bm25Terms.map(t =>
      s"""CASE WHEN tf_$t > 0 THEN CAST(ROUND(
         |            ln((n - df_$t + 0.5) / (df_$t + 0.5) + 1.0)
         |            * tf_$t * 2.2
         |            / (tf_$t + 1.2 * (1.0 - 0.75 + 0.75 * dl / (total_dl / n)))
         |            * 1000000.0) AS BIGINT) ELSE 0 END""".stripMargin)
      .mkString(" + ")
    val nTerms = bm25Terms.map(t =>
      s"CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END").mkString(" + ")
    s"""perdoc AS (
        SELECT doc_id, source, COUNT(*) AS dl,
          $tfCols
        FROM (SELECT doc_id, source, unnest($sqlToks) AS token FROM documents)
        GROUP BY 1, 2),
      bmstats AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n, CAST(SUM(dl) AS BIGINT) AS total_dl,
          $dfCols
        FROM perdoc),
      bmsc AS (
        SELECT doc_id, source, dl AS n_tokens,
          CAST($nTerms AS BIGINT) AS n_terms,
          $contribs AS bm25_1e6
        FROM perdoc CROSS JOIN bmstats),
      bmrk AS (
        SELECT *, CAST(ROW_NUMBER() OVER (
            ORDER BY bm25_1e6 DESC, doc_id ASC) AS INTEGER) AS rank
        FROM bmsc WHERE n_terms > 0)"""
  }

  val q131 = Q(
    "q131_bm25_topk",
    (spark, dir) =>
      Corpus.bm25TopK(Tables.load(spark, dir, "documents"), bm25Terms, 25),
    Some(s"""WITH $bm25RankedCtes
      SELECT doc_id, source, n_tokens, n_terms, bm25_1e6, rank
      FROM bmrk WHERE rank <= 25""")
  )

  /** TextRank keyword centrality ([[Corpus.textRank]], 3 power-iteration
    * rounds). The oracle UNROLLS the same integer-arithmetic iteration as
    * chained CTEs — ranks in 1e-9 units, damping as the 85/100 rational,
    * floor divisions only — so the graph build, the teleport base, and
    * all three rounds are hash-checked with zero floating point on either
    * engine. */
  val q135 = Q(
    "q135_textrank",
    (spark, dir) =>
      Corpus.textRank(Tables.load(spark, dir, "documents"), iters = 3),
    Some {
      val iterCtes = (1 to 3).map { i =>
        val prev = if (i == 1) "r0" else s"r${i - 1}"
        s"""i$i AS (
        SELECT e.dst AS token, CAST(SUM((r.r * e.w) // o.wout) AS BIGINT) AS inflow
        FROM edges e JOIN wout o ON e.src = o.src
          JOIN $prev r ON r.token = e.src
        GROUP BY 1),
      r$i AS (
        SELECT n.token,
          (150000000 // nc.n) + ((COALESCE(i$i.inflow, 0) * 85) // 100) AS r
        FROM nodes n LEFT JOIN i$i ON i$i.token = n.token, nc)"""
      }.mkString(",\n      ")
      s"""WITH big AS (
        SELECT toks[i] AS src, toks[i + 1] AS dst
        FROM (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i
              FROM (SELECT $sqlToks AS toks FROM documents))),
      edges AS (SELECT src, dst, COUNT(*) AS w FROM big GROUP BY 1, 2),
      nodes AS (SELECT src AS token FROM edges
                UNION SELECT dst FROM edges),
      nc AS (SELECT COUNT(*) AS n FROM nodes),
      wout AS (SELECT src, CAST(SUM(w) AS BIGINT) AS wout FROM edges GROUP BY 1),
      r0 AS (SELECT token, 1000000000 // nc.n AS r FROM nodes, nc),
      $iterCtes
      SELECT token, CAST(r AS BIGINT) AS rank_1e9,
        CAST(ROW_NUMBER() OVER (ORDER BY r DESC, token ASC) AS INTEGER) AS pos
      FROM r3"""
    }
  )

  /** Subword seed vocabulary ([[Corpus.subwordSeedVocab]], 2–5-char
    * pieces, top 50). The oracle regenerates the weighted substring
    * relation from the same token-count CTE (two chained lateral
    * unnests), so the vocab-relation generation trick — not just the
    * final counts — is semantically pinned. */
  val q138 = Q(
    "q138_subword_seed_vocab",
    (spark, dir) => Corpus.subwordSeedVocab(
      Tables.load(spark, dir, "documents"), minN = 2, maxN = 5, k = 50),
    Some(s"""WITH tc AS (
        SELECT tok, COUNT(*) AS n
        FROM (SELECT unnest($sqlToks) AS tok FROM documents)
        GROUP BY tok),
      lv AS (SELECT tok, n, unnest([2, 3, 4, 5]) AS l FROM tc),
      sv AS (
        SELECT substr(tok, CAST(s AS INTEGER), CAST(l AS INTEGER)) AS ngram, n
        FROM (SELECT tok, n, l,
                unnest(generate_series(1, length(tok) - l + 1)) AS s
              FROM lv)),
      ag AS (SELECT ngram, CAST(SUM(n) AS BIGINT) AS n_occ
             FROM sv GROUP BY ngram),
      rk AS (SELECT *, CAST(ROW_NUMBER() OVER (
               ORDER BY n_occ DESC, ngram ASC) AS INTEGER) AS rank
             FROM ag)
      SELECT ngram, n_occ, rank FROM rk WHERE rank <= 50""")
  )

  /** Global octile bucketing of document length
    * ([[graft.operators.Quantiles.bucketByGlobalQuantiles]], 8 buckets)
    * with per-bucket population stats — the histogram-equalization step
    * of curriculum/quality binning. The ps are DYADIC (i/8), hence
    * binary-exact in both engines' ceil(p·n) rank arithmetic — no
    * decimal-vs-double literal semantics in the contract. The oracle
    * recomputes cuts from the same compressed histogram window and
    * assigns buckets with the same cuts-below count. */
  val q140 = Q(
    "q140_length_octiles",
    (spark, dir) => {
      import org.apache.spark.sql.functions._
      graft.operators.Quantiles.bucketByGlobalQuantiles(
        Tables.load(spark, dir, "documents").select(col("n_chars")),
        "n_chars", nBuckets = 8)
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"), min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"))
    },
    Some {
      val cuts = (1 until 8).map(i =>
        s"MIN(CASE WHEN cum >= ceil(${i / 8.0} * n) THEN n_chars END) AS c$i")
        .mkString(",\n          ")
      val below = (1 until 8).map(i =>
        s"(CASE WHEN d.n_chars > c$i THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH h AS (SELECT n_chars, COUNT(*) AS c FROM documents GROUP BY 1),
      w AS (SELECT *, SUM(c) OVER (ORDER BY n_chars) AS cum,
              SUM(c) OVER () AS n FROM h),
      cuts AS (
        SELECT
          $cuts
        FROM w),
      b AS (SELECT d.n_chars,
              CAST($below + 1 AS INTEGER) AS bucket
            FROM documents d CROSS JOIN cuts)
      SELECT bucket, COUNT(*) AS n_docs, MIN(n_chars) AS min_chars,
        MAX(n_chars) AS max_chars
      FROM b GROUP BY 1"""
    }
  )

  /** PMI collocation mining ([[Corpus.collocations]], min count 5, top
    * 20). The oracle mirrors the exact integer-product/single-division/
    * ln/micro-round pipeline over the same bigram and unigram count
    * CTEs. */
  val q145 = Q(
    "q145_collocations",
    (spark, dir) => Corpus.collocations(
      Tables.load(spark, dir, "documents"), minCount = 5L, k = 20),
    Some(s"""WITH big AS (
        SELECT toks[i] AS w1, toks[i + 1] AS w2
        FROM (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i
              FROM (SELECT $sqlToks AS toks FROM documents))),
      c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM big GROUP BY 1, 2
              HAVING COUNT(*) >= 5),
      uni AS (SELECT tok, COUNT(*) AS c
              FROM (SELECT unnest($sqlToks) AS tok FROM documents)
              GROUP BY 1),
      tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t_tokens FROM uni),
      nb AS (SELECT COUNT(*) AS n_bigrams FROM big),
      sc AS (
        SELECT w1, w2, c12,
          CAST(ROUND(ln((c12 * t_tokens * t_tokens)
              / (n_bigrams * u1.c * u2.c)) * 1000000) AS BIGINT) AS pmi_1e6
        FROM c12
          JOIN uni u1 ON u1.tok = w1
          JOIN uni u2 ON u2.tok = w2, tot, nb),
      rk AS (SELECT *, CAST(ROW_NUMBER() OVER (
               ORDER BY pmi_1e6 DESC, w1 ASC, w2 ASC) AS INTEGER) AS rank
             FROM sc)
      SELECT w1, w2, c12, pmi_1e6, rank FROM rk WHERE rank <= 20""")
  )

  /** HELD-OUT bigram-LM scoring ([[Corpus.bigramLogProbScored]]): the
    * model fits on even doc_ids only, odd docs are scored against it —
    * q106's self-scored contract turned into the train/validation
    * evaluation a pipeline actually runs (the q125 frozen-artifact
    * discipline, for the LM). Unseen bigrams take the Laplace floor via
    * COALESCEd left joins on both engines. */
  val q147 = Q(
    "q147_heldout_logprob",
    (spark, dir) => {
      import org.apache.spark.sql.functions.col
      val docs = Tables.load(spark, dir, "documents")
      Corpus.bigramLogProbScored(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 =!= 0))
    },
    Some(s"""WITH big AS (
        SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
        FROM (SELECT doc_id, toks,
                unnest(generate_series(1, len(toks) - 1)) AS i
              FROM (SELECT doc_id, $sqlToks AS toks FROM documents))),
      c12 AS (SELECT w1, w2, COUNT(*) AS n12 FROM big
              WHERE doc_id % 2 = 0 GROUP BY 1, 2),
      c1 AS (SELECT w1, CAST(SUM(n12) AS BIGINT) AS n1 FROM c12 GROUP BY 1),
      v AS (SELECT COUNT(DISTINCT tok) AS vocab
            FROM (SELECT doc_id, unnest($sqlToks) AS tok FROM documents)
            WHERE doc_id % 2 = 0),
      scored AS (SELECT b.doc_id,
          CAST(ROUND(ln((COALESCE(n12, 0) + 1.0)
              / (COALESCE(n1, 0) + vocab)) * 1000000) AS BIGINT) AS lp
        FROM big b
          LEFT JOIN c12 USING (w1, w2)
          LEFT JOIN c1 USING (w1), v
        WHERE b.doc_id % 2 = 1),
      per_doc AS (SELECT doc_id, COUNT(*) AS n_bigrams,
          CAST(SUM(lp) AS BIGINT) AS logprob_micros
        FROM scored GROUP BY 1)
      SELECT d.doc_id,
        COALESCE(n_bigrams, CAST(0 AS BIGINT)) AS n_bigrams,
        COALESCE(logprob_micros, CAST(0 AS BIGINT)) AS logprob_micros
      FROM documents d LEFT JOIN per_doc USING (doc_id)
      WHERE d.doc_id % 2 = 1""")
  )

  /** Number of BPE merge rounds for q154/q155 — small enough that the
    * oracle's per-round CTE unroll stays tractable in DuckDB, large
    * enough that learned symbols chain (merges built on earlier merges'
    * outputs). */
  private val bpeRounds = 12

  /** The BPE training loop as an oracle CTE chain (the q135 unroll
    * pattern): `w`/`s0` are the even-split word frequencies and their
    * character symbolizations under the double-space invariant
    * ([[Corpus.bpeTrain]] scaladoc), then per round k: `p{k}` counts
    * adjacent pairs, `b{k}` picks the argmax under (n desc, l, r), `s{k}`
    * applies the merge with the same literal `replace` the Spark side
    * uses. With `withTarget`, the ODD split (`wt`/`t0`…`t{N}`) is
    * threaded through the identical per-round replace so the encode
    * oracle applies learned merges without re-deriving them.
    *
    * Every multiply-referenced CTE is `AS MATERIALIZED`: DuckDB inlines
    * CTEs per REFERENCE, and with s{k}/b{k} each read twice the unrolled
    * plan doubles per round — 2^N copies of the whole chain. Pinning
    * each round makes the oracle linear in N, like the Spark side.
    *
    * Early EXHAUSTION (a corpus supporting fewer than N merges): an
    * empty b{k} would cross-join the word relation to nothing and wipe
    * every later round, so `bs{k}` substitutes the sentinel pair ('','')
    * whose pattern (four spaces) can never occur under the double-space
    * invariant — later rounds no-op, exactly like the Spark loop's
    * break; the merge-table output reads from the raw b{k}, so exhausted
    * rounds contribute no rows on either engine. */
  private def bpeCtes(withTarget: Boolean): String = {
    val sb = new StringBuilder
    sb ++= s"""WITH w AS (
        SELECT tok AS word, COUNT(*) AS freq
        FROM (SELECT unnest($sqlToks) AS tok FROM documents
              WHERE doc_id % 2 = 0)
        GROUP BY tok),
      s0 AS MATERIALIZED (
        SELECT regexp_replace(word, '(?s)(.)', ' \\1 ', 'g') AS s, freq
        FROM w)"""
    if (withTarget) sb ++= s""",
      wt AS (
        SELECT tok AS word, COUNT(*) AS freq
        FROM (SELECT unnest($sqlToks) AS tok FROM documents
              WHERE doc_id % 2 = 1)
        GROUP BY tok),
      t0 AS MATERIALIZED (
        SELECT word, regexp_replace(word, '(?s)(.)', ' \\1 ', 'g') AS s,
          freq
        FROM wt)"""
    for (k <- 1 to bpeRounds) {
      val p = k - 1
      sb ++= s""",
      p$k AS (
        SELECT syms[i] AS l, syms[i + 1] AS r, CAST(SUM(freq) AS BIGINT) AS n
        FROM (SELECT syms, freq,
                unnest(generate_series(1, len(syms) - 1)) AS i
              FROM (SELECT string_split(trim(s), '  ') AS syms, freq
                    FROM s$p))
        GROUP BY 1, 2),
      b$k AS MATERIALIZED (
        SELECT l, r, n FROM p$k ORDER BY n DESC, l ASC, r ASC LIMIT 1),
      bs$k AS MATERIALIZED (
        SELECT l, r FROM b$k
        UNION ALL
        SELECT '', '' WHERE NOT EXISTS (SELECT 1 FROM b$k)),
      s$k AS MATERIALIZED (
        SELECT replace(s, ' ' || l || '  ' || r || ' ',
                       ' ' || l || r || ' ') AS s, freq
        FROM s$p CROSS JOIN bs$k)"""
      if (withTarget) sb ++= s""",
      t$k AS MATERIALIZED (
        SELECT word, replace(s, ' ' || l || '  ' || r || ' ',
                             ' ' || l || r || ' ') AS s, freq
        FROM t$p CROSS JOIN bs$k)"""
    }
    sb.result()
  }

  /** BPE merge-loop tokenizer TRAINING ([[Corpus.bpeTrain]]) on the even
    * doc_id split: 12 rounds of count-adjacent-pairs → argmax → merge,
    * emitting the learned merge table. The oracle unrolls every round as
    * CTEs and recomputes the argmax chain from scratch — a wrong pair
    * count, tie-break, or merge application in ANY round derails every
    * later round and hash-mismatches. */
  val q154 = Q(
    "q154_bpe_train",
    (spark, dir) => {
      import org.apache.spark.sql.functions.col
      Corpus.bpeTrain(
        Corpus.bpeWordFreqs(Tables.load(spark, dir, "documents")
          .filter(col("doc_id") % 2 === 0)),
        nMerges = bpeRounds)
    },
    Some {
      val rows = (1 to bpeRounds).map(k =>
        s"""SELECT CAST($k AS INTEGER) AS rank, l AS left_sym,
           r AS right_sym, n AS pair_n FROM b$k""")
        .mkString("\n      UNION ALL ")
      s"""${bpeCtes(withTarget = false)}
      $rows"""
    }
  )

  /** The FROZEN BPE merge table: trained on the even split once per sf
    * dir and persisted — q155 measures the ENCODE side, which must never
    * re-train (the q125 frozen-artifact contract, for the subword
    * tokenizer). */
  private val stagedBpe =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private def frozenBpeDir(spark: org.apache.spark.sql.SparkSession,
      dir: String): String =
    stagedBpe.getOrElseUpdate(dir, {
      import org.apache.spark.sql.functions.col
      val t = ParityQueries.scratchDir("graft-frozen-bpe")
      Corpus.bpeTrain(
        Corpus.bpeWordFreqs(Tables.load(spark, dir, "documents")
          .filter(col("doc_id") % 2 === 0)),
        nMerges = bpeRounds)
        .write.mode("overwrite").parquet(t)
      t
    })

  /** Encode-under-learned-merges: the odd split's distinct words replay
    * the frozen merge list in rank order ([[Corpus.bpeEncode]] — a
    * row-local chain of literal replaces; the merge table itself is the
    * only driver-held piece, bounded by the round count), then subword
    * occurrence totals rank the top 50. Encoding works on DISTINCT words
    * weighted by occurrence count — the corpus pays one token shuffle,
    * never a per-occurrence replay. The oracle re-derives the merges AND
    * the odd-split encode in one CTE chain. */
  val q155 = Q(
    "q155_bpe_encode",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types.IntegerType
      val merges = spark.read.parquet(frozenBpeDir(spark, dir))
        .orderBy(col("rank")).collect()
        .map(r => (r.getAs[String]("left_sym"), r.getAs[String]("right_sym")))
        .toSeq
      val enc = Corpus.bpeWordFreqs(Tables.load(spark, dir, "documents")
          .filter(col("doc_id") % 2 =!= 0))
        .select(explode(Corpus.bpeEncode(col("word"), merges)).as("subword"),
          col("freq"))
        .groupBy(col("subword")).agg(sum(col("freq")).as("n_occ"))
      val ord = Seq(col("n_occ").desc, col("subword").asc)
      enc.orderBy(ord: _*).limit(50)
        .withColumn("rank",
          row_number().over(Window.orderBy(ord: _*)).cast(IntegerType))
    },
    Some(s"""${bpeCtes(withTarget = true)},
      enc AS (SELECT unnest(string_split(trim(s), '  ')) AS subword, freq
              FROM t$bpeRounds),
      ag AS (SELECT subword, CAST(SUM(freq) AS BIGINT) AS n_occ
             FROM enc GROUP BY 1),
      rk AS (SELECT *, CAST(ROW_NUMBER() OVER (
               ORDER BY n_occ DESC, subword ASC) AS INTEGER) AS rank
             FROM ag)
      SELECT subword, n_occ, rank FROM rk WHERE rank <= 50""")
  )

  /** End-to-end tokenizer → loader composition: pack the odd split into
    * token-budget bins where token counts come from the LEARNED BPE
    * tokenizer, not whitespace — the packing a real pretraining loader
    * runs ([[graft.operators.Corpus.bpeDocTokenCounts]] feeding
    * [[graft.operators.Packing.packByCounts]]). Distinct words encode
    * once under the frozen q155 merge artifact (vocab-bounded,
    * broadcast); the corpus pays one token explode + one doc-key shuffle
    * + the shard window. The oracle re-derives the merges, every word's
    * encoded LENGTH, the per-doc sums, and the md5 shard/cum/bin
    * arithmetic in one chain — a drifted merge table shifts token counts
    * and re-bins downstream docs, so the whole composition is
    * hash-checked. */
  val q160 = Q(
    "q160_bpe_packing",
    (spark, dir) => {
      import org.apache.spark.sql.functions.col
      val merges = spark.read.parquet(frozenBpeDir(spark, dir))
        .orderBy(col("rank")).collect()
        .map(r => (r.getAs[String]("left_sym"), r.getAs[String]("right_sym")))
        .toSeq
      val odd = Tables.load(spark, dir, "documents")
        .filter(col("doc_id") % 2 =!= 0)
      graft.operators.Packing.packByCounts(
        Corpus.bpeDocTokenCounts(odd, merges),
        nShards = 4, seed = 11L, tokenBudget = 256)
    },
    Some(s"""${bpeCtes(withTarget = true)},
      wl AS (SELECT word,
               CAST(len(string_split(trim(s), '  ')) AS BIGINT) AS wlen
             FROM t$bpeRounds),
      dtok AS (SELECT doc_id, unnest($sqlToks) AS word
               FROM documents WHERE doc_id % 2 = 1),
      dc AS (SELECT doc_id, CAST(SUM(wlen) AS BIGINT) AS n_tokens
             FROM dtok JOIN wl USING (word) GROUP BY 1),
      shk AS (SELECT doc_id, n_tokens,
               md5(concat('11:', CAST(doc_id AS VARCHAR))) AS skey
             FROM dc),
      sha AS (SELECT doc_id, n_tokens, skey,
               CAST(('0x' || substr(skey, 1, 7))::BIGINT % 4 AS INTEGER)
                 AS shard
             FROM shk),
      win AS (SELECT doc_id, shard, n_tokens,
               CAST(ROW_NUMBER() OVER (PARTITION BY shard
                 ORDER BY skey, doc_id) AS INTEGER) AS pos,
               SUM(n_tokens) OVER (PARTITION BY shard
                 ORDER BY skey, doc_id ROWS UNBOUNDED PRECEDING) AS cum
             FROM sha)
      SELECT doc_id, shard, pos, n_tokens,
        GREATEST(CAST(CEIL(CAST(cum AS DOUBLE) / 256) AS INTEGER), 1) AS bin
      FROM win""")
  )

  val all: Seq[Q] =
    Seq(q66, q67, q68, q69, q78, q92, q93, q101, q102, q106, q108, q114,
      q117, q125, q131, q135, q138, q140, q145, q147, q154, q155, q160)
}
