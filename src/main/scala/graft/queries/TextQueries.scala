package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.operators.{Dedup, TextAnalysis => TA}

/** Text-analysis + deduplication query surface over the `documents` table.
  * Oracle SQL is DuckDB dialect; where a query's values depend on Spark's
  * hash functions (xxhash64/murmur3: MinHash, SimHash) there is no oracle
  * and the driver records a rows-only check.
  */
object TextQueries {

  private val toks = TA.tokens(col("text"))
  // private[queries]: q62's oracle mirrors the same tokenizer — a single
  // definition keeps the Spark/DuckDB contract from silently diverging
  private[queries] val sqlToks = "string_split_regex(trim(text), '\\s+')"
  private[queries] val sqlShingles =
    s"""list_transform(generate_series(1, len($sqlToks)-2),
        i -> concat_ws(' ', $sqlToks[i], $sqlToks[i+1], $sqlToks[i+2]))"""

  /** Occurrence count of a marker word, DuckDB rendering of
    * [[TA.wordOccurrences]] (identical token-equality count). */
  private def sqlOcc(w: String): String =
    s"CAST(len(list_filter($sqlToks, t -> t = '$w')) AS INTEGER)"

  /** Token counting + lexical diversity per document. */
  val q20 = Q(
    "q20_token_stats",
    (spark, dir) => {
      // project the token array once; multi-referenced non-cheap aliases
      // stay in their own projection (CollapseProject keeps them), so the
      // regex split runs once per row
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("lang"), length(col("text")).as("len_chars"),
          toks.as("toks"))
        .select(col("doc_id"), col("lang"),
          size(col("toks")).as("n_tokens"),
          size(array_distinct(col("toks"))).as("n_distinct"),
          col("len_chars"),
          (size(array_distinct(col("toks"))).cast(DoubleType) /
            size(col("toks"))).as("ttr"))
    },
    Some(s"""SELECT doc_id, lang,
      CAST(len($sqlToks) AS INTEGER) AS n_tokens,
      CAST(len(list_distinct($sqlToks)) AS INTEGER) AS n_distinct,
      CAST(length(text) AS INTEGER) AS len_chars,
      CAST(len(list_distinct($sqlToks)) AS DOUBLE) / len($sqlToks) AS ttr
    FROM documents""")
  )

  /** Quality scoring: pure-arithmetic heuristics (no transcendentals, so
    * the oracle is bit-exact). */
  val q21 = Q(
    "q21_quality_score",
    (spark, dir) => {
      val nTokens = size(toks)
      val nChars = length(col("text"))
      val noSpace = length(regexp_replace(col("text"), " ", ""))
      val stop = (TA.wordOccurrences(col("text"), "the") +
        TA.wordOccurrences(col("text"), "a")).cast(DoubleType) / nTokens
      Tables.load(spark, dir, "documents").select(
        col("doc_id"),
        nTokens.as("n_tokens"),
        (noSpace.cast(DoubleType) / nTokens).as("avg_token_len"),
        stop.as("stopword_ratio"),
        (TA.typeTokenRatio(toks) * lit(0.7) +
          (lit(1.0) - stop) * lit(0.3)).as("quality_score"))
    },
    Some(s"""SELECT doc_id,
      CAST(len($sqlToks) AS INTEGER) AS n_tokens,
      CAST(length(replace(text, ' ', '')) AS DOUBLE) / len($sqlToks) AS avg_token_len,
      CAST(${sqlOcc("the")} + ${sqlOcc("a")} AS DOUBLE) / len($sqlToks) AS stopword_ratio,
      (CAST(len(list_distinct($sqlToks)) AS DOUBLE) / len($sqlToks)) * 0.7 +
        (1.0 - CAST(${sqlOcc("the")} + ${sqlOcc("a")} AS DOUBLE) / len($sqlToks)) * 0.3
        AS quality_score
    FROM documents""")
  )

  /** Corpus stats by language label. */
  val q22 = Q(
    "q22_lang_stats",
    (spark, dir) => {
      Tables.load(spark, dir, "documents")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          (sum(col("n_chars")).cast(DoubleType) / count(lit(1))).as("avg_chars"))
    },
    Some("""SELECT lang, COUNT(*) AS n_docs,
      CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
    FROM documents GROUP BY lang""")
  )

  /** Exact dedup groups (hash-groupBy on md5(text)). */
  val q23 = Q(
    "q23_dedup_exact",
    (spark, dir) => Dedup.exactGroups(Tables.load(spark, dir, "documents")),
    Some("""SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_id,
      COUNT(*) AS n_copies
    FROM documents GROUP BY md5(text)""")
  )

  /** Marker-word language-ID heuristic vs the labeled language. */
  val q24 = Q(
    "q24_lang_guess",
    (spark, dir) => {
      Tables.load(spark, dir, "documents").select(
        col("doc_id"), col("lang"),
        TA.langGuess(col("text")).as("guessed_lang"),
        TA.wordOccurrences(col("text"), "the").as("c_en"),
        TA.wordOccurrences(col("text"), "der").as("c_de"),
        TA.wordOccurrences(col("text"), "le").as("c_fr"),
        TA.wordOccurrences(col("text"), "el").as("c_es"))
    },
    Some(s"""SELECT doc_id, lang,
      CASE WHEN COALESCE(greatest(${sqlOcc("the")}, ${sqlOcc("der")}, ${sqlOcc("le")}, ${sqlOcc("el")}), 0) = 0 THEN 'und'
           WHEN ${sqlOcc("the")} = greatest(${sqlOcc("the")}, ${sqlOcc("der")}, ${sqlOcc("le")}, ${sqlOcc("el")}) THEN 'en'
           WHEN ${sqlOcc("der")} = greatest(${sqlOcc("the")}, ${sqlOcc("der")}, ${sqlOcc("le")}, ${sqlOcc("el")}) THEN 'de'
           WHEN ${sqlOcc("le")} = greatest(${sqlOcc("the")}, ${sqlOcc("der")}, ${sqlOcc("le")}, ${sqlOcc("el")}) THEN 'fr'
           ELSE 'es' END AS guessed_lang,
      ${sqlOcc("the")} AS c_en, ${sqlOcc("der")} AS c_de,
      ${sqlOcc("le")} AS c_fr, ${sqlOcc("el")} AS c_es
    FROM documents""")
  )

  /** Content fingerprint: md5 over sorted distinct 3-gram shingles. */
  val q25 = Q(
    "q25_shingle_fingerprint",
    (spark, dir) => {
      // native sorted-distinct shingles (spec-pinned to the old chain)
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"),
          graft.functions.SetCols.sortedShingles3(col("text")).as("sh"))
        .select(col("doc_id"),
          md5(concat_ws("|", col("sh"))).as("fingerprint"),
          size(col("sh")).as("n_shingles"))
    },
    Some(s"""SELECT doc_id,
      md5(array_to_string(list_sort(list_distinct($sqlShingles)), '|')) AS fingerprint,
      CAST(len(list_distinct($sqlShingles)) AS INTEGER) AS n_shingles
    FROM documents""")
  )

  /** Exact n-gram Jaccard near-dup pairs. Candidate generation uses
    * lossless prefix filtering (AllPairs/PPJoin), so the result — and the
    * oracle — is identical to the naive inverted-index join at a fraction
    * of the join volume. */
  val q26 = Q(
    "q26_jaccard_near_dups",
    (spark, dir) =>
      Dedup.jaccardPairsPrefixHash(Tables.load(spark, dir, "documents"), 0.5),
    Some(s"""WITH sh AS (
        SELECT doc_id, unnest(list_distinct($sqlShingles)) AS shingle
        FROM documents),
      sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
    SELECT doc_a, doc_b,
      CAST(n_common AS DOUBLE) / (na.n + nb.n - n_common) AS jaccard
    FROM inter
      JOIN sizes na ON na.doc_id = doc_a
      JOIN sizes nb ON nb.doc_id = doc_b
    WHERE CAST(n_common AS DOUBLE) / (na.n + nb.n - n_common) >= 0.5""")
  )

  /** MinHash-LSH near-dup detection. Candidates are exact-Jaccard
    * verified, so the output equals the exhaustive q26 pair set whenever
    * LSH recall is 100% — which DedupSpec asserts against exact Jaccard on
    * the corpus — so q26's brute-force oracle SQL backs this query too
    * (candidate generation differs; the verified result must not). */
  val q27 = Q(
    "q27_minhash_near_dups",
    (spark, dir) => Dedup.minHashNearDups(
      Tables.load(spark, dir, "documents"), k = 32, rowsPerBand = 4,
      threshold = 0.5),
    q26.oracle
  )

  /** 64-bit SimHash signatures. The md5-derived token hash makes the
    * signature engine-portable: the oracle recomputes the per-bit votes
    * (64 rows per token — fine for an oracle, the Spark side stays the
    * one-pass aggregate) and assembles the signature with HUGEINT shifts. */
  val q28 = Q(
    "q28_simhash",
    (spark, dir) => Dedup.simHash(Tables.load(spark, dir, "documents")),
    Some(s"""WITH u AS (
        SELECT doc_id, unnest($sqlToks) AS tok FROM documents),
      h AS (
        SELECT doc_id,
          ('0x' || substr(md5(tok), 1, 1))::BIGINT AS hi,
          ('0x' || substr(md5(tok), 2, 15))::BIGINT AS lo
        FROM u),
      v AS (
        SELECT doc_id, i,
          SUM(CASE WHEN (CASE WHEN i < 60 THEN (lo >> i) & 1
                              ELSE (hi >> (i - 60)) & 1 END) = 1
              THEN 1 ELSE -1 END) AS votes
        FROM h CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i)
        GROUP BY doc_id, i),
      s AS (
        SELECT doc_id,
          SUM(CASE WHEN votes > 0 THEN 1::HUGEINT << i ELSE 0::HUGEINT END) AS r
        FROM v GROUP BY doc_id)
    SELECT doc_id,
      CAST(CASE WHEN r >= 9223372036854775808::HUGEINT
                THEN r - 18446744073709551616::HUGEINT ELSE r END AS BIGINT) AS simhash
    FROM s""")
  )

  /** BPE-ish token counting alongside whitespace tokens. */
  val q29 = Q(
    "q29_bpe_token_stats",
    (spark, dir) => {
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"), toks.as("wtoks"), TA.bpeTokens(col("text")).as("btoks"))
        .select(col("doc_id"),
          size(col("wtoks")).as("n_word_tokens"),
          size(col("btoks")).as("n_bpe_tokens"),
          (size(col("btoks")).cast(DoubleType) / size(col("wtoks")))
            .as("bpe_per_word"))
    },
    Some(s"""SELECT doc_id,
      CAST(len($sqlToks) AS INTEGER) AS n_word_tokens,
      CAST(len(regexp_extract_all(text, '${TA.bpePattern}')) AS INTEGER) AS n_bpe_tokens,
      CAST(len(regexp_extract_all(text, '${TA.bpePattern}')) AS DOUBLE) / len($sqlToks)
        AS bpe_per_word
    FROM documents""")
  )

  /** Order-sensitive rolling-hash fingerprint. The md5-based token hash
    * makes the fold engine-portable: the oracle reproduces the exact
    * Java-wraparound arithmetic with HUGEINT mod 2^64. */
  val q35 = Q(
    "q35_rolling_fingerprint",
    (spark, dir) => {
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"), toks.as("toks"))
        .select(col("doc_id"), TA.rollingHash(col("toks")).as("fingerprint"),
          size(col("toks")).as("n_tokens"))
    },
    Some(s"""SELECT doc_id,
      CAST(CASE WHEN r >= 9223372036854775808::HUGEINT
                THEN r - 18446744073709551616::HUGEINT ELSE r END AS BIGINT) AS fingerprint,
      CAST(len($sqlToks) AS INTEGER) AS n_tokens
    FROM (
      SELECT doc_id, text,
        CASE WHEN len($sqlToks) = 0 THEN 0::HUGEINT
        ELSE list_reduce(
          list_transform($sqlToks, t -> (('0x' || substr(md5(t), 1, 15))::BIGINT)::HUGEINT),
          (a, h) -> (a * 31 + h) % 18446744073709551616::HUGEINT)
        END AS r
      FROM documents)""")
  )

  /** Scrub/normalize pass (the PII-redaction shape): digit runs become a
    * placeholder token, text lowercased; emitted as a content hash so the
    * oracle verifies the transform without shipping the full text. */
  val q43 = Q(
    "q43_scrub_normalize",
    (spark, dir) => {
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"),
          md5(lower(regexp_replace(col("text"), "[0-9]+", "<NUM>")))
            .as("normalized_hash"),
          length(regexp_replace(col("text"), "[0-9]+", "<NUM>"))
            .cast(IntegerType).as("normalized_len"))
    },
    Some("""SELECT doc_id,
      md5(lower(regexp_replace(text, '[0-9]+', '<NUM>', 'g'))) AS normalized_hash,
      CAST(length(regexp_replace(text, '[0-9]+', '<NUM>', 'g')) AS INTEGER) AS normalized_len
    FROM documents""")
  )

  /** Repetition-ratio quality signal: the most frequent token's share of
    * the document (boilerplate/spam indicator). */
  val q44 = Q(
    "q44_repetition_ratio",
    (spark, dir) => {
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"), explode(toks).as("tok"))
        .groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("doc_id"))
        .agg(max(col("n")).as("max_freq"),
          sum(col("n")).as("n_tokens"),
          (max(col("n")).cast(DoubleType) / sum(col("n"))).as("rep_ratio"))
    },
    Some(s"""WITH t AS (SELECT doc_id, unnest($sqlToks) AS tok FROM documents),
      c AS (SELECT doc_id, tok, COUNT(*) AS n FROM t GROUP BY 1, 2)
    SELECT doc_id, CAST(MAX(n) AS BIGINT) AS max_freq,
      CAST(SUM(n) AS BIGINT) AS n_tokens,
      CAST(MAX(n) AS DOUBLE) / SUM(n) AS rep_ratio
    FROM c GROUP BY doc_id""")
  )

  /** df-CAPPED Jaccard near-dup pairs: shingles occurring in more than
    * maxDf=3 documents generate NO candidates — the explicit bound on the
    * worst inverted-list join for corpora where even prefix filtering must
    * be capped. Deliberately NOT q26's result: pairs whose every shared
    * shingle is hotter than the cap (e.g. members of 4+-copy duplicate
    * clusters, whose shingles all carry df ≥ 4) are missed by contract,
    * and the oracle reproduces the same capped candidate generation, so
    * the driver hash-checks the recall contract itself — reported pairs
    * exact (verify intersects FULL shingle sets), misses only
    * all-hot-shingle pairs. TextSpec pins the same contract against the
    * lossless q26 result at the unit tier. */
  val q75 = Q(
    "q75_jaccard_capped",
    (spark, dir) =>
      Dedup.jaccardPairsCapped(Tables.load(spark, dir, "documents"),
        threshold = 0.5, maxDf = 3),
    Some(s"""WITH sh AS (
        SELECT doc_id, unnest(list_distinct($sqlShingles)) AS shingle
        FROM documents),
      sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      df AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle),
      rare AS (SELECT sh.doc_id, sh.shingle
               FROM sh JOIN df ON sh.shingle = df.shingle WHERE df.df <= 3),
      cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
               FROM rare a JOIN rare b
                 ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
      inter AS (
        SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
        FROM cand c
          JOIN sh a ON a.doc_id = c.doc_a
          JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
        GROUP BY 1, 2)
    SELECT doc_a, doc_b,
      CAST(n_common AS DOUBLE) / (na.n + nb.n - n_common) AS jaccard
    FROM inter
      JOIN sizes na ON na.doc_id = doc_a
      JOIN sizes nb ON nb.doc_id = doc_b
    WHERE CAST(n_common AS DOUBLE) / (na.n + nb.n - n_common) >= 0.5""")
  )

  /** PII scrubbing ([[TA.scrubPii]]): emails and phone-ish digit runs →
    * typed placeholders. The corpus carries no organic PII, so each doc's
    * text is AUGMENTED with a synthetic doc_id-derived address and phone
    * before scrubbing — every row exercises both patterns, and the oracle
    * must reproduce the identical regex semantics (patterns live in the
    * Java∩RE2 common subset; DuckDB needs the 'g' flag to match Spark's
    * replace-all). Output is the md5 of the scrubbed text plus its length
    * — a full-content check without shipping the text. */
  val q77 = Q(
    "q77_pii_scrub",
    (spark, dir) => {
      val aug = concat(col("text"), lit(" contact user"),
        col("doc_id").cast(StringType), lit("@example.com or +1-555-010-"),
        col("doc_id").cast(StringType), lit(" now"))
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"), TA.scrubPii(aug).as("scrubbed"))
        .select(col("doc_id"), md5(col("scrubbed")).as("scrub_hash"),
          length(col("scrubbed")).as("n_scrubbed_chars"))
    },
    Some(s"""WITH s AS (
        SELECT doc_id,
          regexp_replace(
            regexp_replace(
              text || ' contact user' || CAST(doc_id AS VARCHAR) ||
                '@example.com or +1-555-010-' || CAST(doc_id AS VARCHAR) || ' now',
              '${TA.emailPattern}', '<EMAIL>', 'g'),
            '${TA.phonePattern}', '<PHONE>', 'g') AS scrubbed
        FROM documents)
      SELECT doc_id, md5(scrubbed) AS scrub_hash,
        CAST(length(scrubbed) AS INTEGER) AS n_scrubbed_chars
      FROM s""")
  )

  /** Quantile-based quality selection: keep each language's top-half by
    * q21's quality score — the data-selection step that cuts a corpus to
    * its best fraction per stratum. The cut runs on PERCENT_RANK, not a
    * computed quantile value: percent_rank is (rank−1)/(n−1) — pure
    * integer arithmetic on an ordering both engines derive from identical
    * quality doubles — so the `>= 0.5` boundary is exact, where comparing
    * against an interpolated median would hinge on last-ulp interpolation
    * drift. doc_id tiebreak makes every rank unique. Scale note: the
    * per-language window funnels each stratum to one partition; for
    * low-cardinality strata at 100 TB, swap in an approx-quantile
    * threshold broadcast against the scan (two scan-only passes). */
  val q81 = Q(
    "q81_quality_select",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val stop = (TA.wordOccurrences(col("text"), "the") +
        TA.wordOccurrences(col("text"), "a")).cast(DoubleType) / size(toks)
      val quality = TA.typeTokenRatio(toks) * lit(0.7) +
        (lit(1.0) - stop) * lit(0.3)
      // a single-document stratum has percent_rank 0.0 (the n=1 degenerate
      // of (rank−1)/(n−1)), which the bare cut would DELETE — "keep the
      // top half" must never empty a stratum, so singletons are kept
      // explicitly via a partition count
      val byLang = Window.partitionBy(col("lang"))
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("lang"), quality.as("q"))
        .select(col("doc_id"), col("lang"),
          percent_rank().over(byLang.orderBy(col("q"), col("doc_id"))).as("pr"),
          count(lit(1)).over(byLang).as("n_lang"))
        .filter(col("pr") >= 0.5 || col("n_lang") === 1)
        .select(col("doc_id"), col("lang"))
    },
    Some(s"""WITH s AS (
        SELECT doc_id, lang,
          (CAST(len(list_distinct($sqlToks)) AS DOUBLE) / len($sqlToks)) * 0.7 +
            (1.0 - CAST(${sqlOcc("the")} + ${sqlOcc("a")} AS DOUBLE) / len($sqlToks)) * 0.3
            AS q
        FROM documents),
      r AS (SELECT doc_id, lang,
              PERCENT_RANK() OVER (PARTITION BY lang ORDER BY q, doc_id) AS pr,
              COUNT(*) OVER (PARTITION BY lang) AS n_lang
            FROM s)
      SELECT doc_id, lang FROM r WHERE pr >= 0.5 OR n_lang = 1""")
  )

  /** Exact duplicated-span detection ([[Dedup.duplicateSpans]]): every
    * 20-token window occurring ≥2 times corpus-wide, per occurrence —
    * passage-level dedup (boilerplate, copied paragraphs) where
    * q23/q26/q51 work at document level. Window hashes are row-local
    * md5s, so the oracle rebuilds the identical hash per window and the
    * whole occurrence relation hash-checks. */
  val q83 = Q(
    "q83_duplicate_spans",
    (spark, dir) =>
      Dedup.duplicateSpans(Tables.load(spark, dir, "documents"), span = 20),
    Some(s"""WITH t AS (SELECT doc_id, $sqlToks AS toks FROM documents),
      occ AS (
        SELECT doc_id, CAST(i AS INTEGER) AS start_tok,
          md5(array_to_string(toks[i : i + 19], ' ')) AS span_hash
        FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 19)) AS i
              FROM t WHERE len(toks) >= 20)),
      hot AS (SELECT span_hash, COUNT(*) AS n_occurrences
              FROM occ GROUP BY 1 HAVING COUNT(*) >= 2)
      SELECT occ.doc_id, occ.start_tok, occ.span_hash, hot.n_occurrences
      FROM occ JOIN hot USING (span_hash)""")
  )

  /** Batch 1 (even doc_ids) written ONCE per sf dir as a parquet-backed
    * [[Dedup.writeMinHashIndex]] relation — the persisted artifact of a
    * prior export. Staging work, not query work: q118 measures the
    * incremental path, which must never re-tokenize batch 1. */
  private val stagedMinHashIndex =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private def minHashIndexDir(spark: org.apache.spark.sql.SparkSession,
      dir: String): String =
    stagedMinHashIndex.getOrElseUpdate(dir, {
      val t = ParityQueries.scratchDir("graft-minhash-index")
      Dedup.writeMinHashIndex(
        Tables.load(spark, dir, "documents").filter(col("doc_id") % 2 === 0),
        k = 32, path = t)
      t
    })

  /** Incremental dedup across exports ([[Dedup.minHashNearDupsIncremental]]):
    * batch 2 (odd doc_ids) dedups against batch 1's PERSISTED MinHash
    * index without recomputing it — the weekly-re-export cadence where
    * reprocessing the world is the cost being avoided. Output: every
    * verified near-dup pair touching batch 2 (new-vs-indexed and
    * new-vs-new; indexed-vs-indexed pairs were batch 1's own report). Same
    * (k=32, r=4, t=0.5) as q27, whose 100%-recall banding argument carries
    * over unchanged (the asymmetric join finds every banded pair with a
    * new side), so the oracle recomputes the union corpus FROM SCRATCH
    * with q26's brute-force SQL and keeps the pairs with an odd side. */
  val q118 = Q(
    "q118_incremental_dedup",
    (spark, dir) => {
      val idx = spark.read.parquet(minHashIndexDir(spark, dir))
      Dedup.minHashNearDupsIncremental(
        Tables.load(spark, dir, "documents").filter(col("doc_id") % 2 =!= 0),
        idx, k = 32, rowsPerBand = 4, threshold = 0.5)
    },
    Some(s"""WITH sh AS (
        SELECT doc_id, unnest(list_distinct($sqlShingles)) AS shingle
        FROM documents),
      sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
    SELECT doc_a, doc_b,
      CAST(n_common AS DOUBLE) / (na.n + nb.n - n_common) AS jaccard
    FROM inter
      JOIN sizes na ON na.doc_id = doc_a
      JOIN sizes nb ON nb.doc_id = doc_b
    WHERE CAST(n_common AS DOUBLE) / (na.n + nb.n - n_common) >= 0.5
      AND (doc_a % 2 = 1 OR doc_b % 2 = 1)""")
  )

  /** SimHash near-dup PAIRS ([[Dedup.hammingNearDupPairs]] over the q28
    * signatures): every pair within 5 differing bits, candidates from
    * 8-band Hamming banding (pigeonhole-lossless for maxHamming < 8) and
    * one codegen bit_count(xor) verify per candidate — signature-only
    * dedup, no shingle sets or text anywhere past the one signature
    * pass. Threshold from measurement at sf0.01: the q26 Jaccard≥0.5
    * near-dups sit at Hamming 0–10 (23/25 within 5) while random pairs
    * floor at 7 — the classic simhash trade (cheapest candidate path,
    * recall bounded by signature granularity) that q26/q27 buy back with
    * exact set verification. The oracle extends q28's
    * signature-rebuilding SQL with the brute-force xor/bit_count join,
    * so banding losslessness is hash-checked against all-pairs. */
  val q126 = Q(
    "q126_simhash_near_dups",
    (spark, dir) => Dedup.hammingNearDupPairs(
      Dedup.simHash(Tables.load(spark, dir, "documents")),
      idCol = "doc_id", sigCol = "simhash", maxHamming = 5, nBands = 8),
    Some(s"""WITH u AS (
        SELECT doc_id, unnest($sqlToks) AS tok FROM documents),
      h AS (
        SELECT doc_id,
          ('0x' || substr(md5(tok), 1, 1))::BIGINT AS hi,
          ('0x' || substr(md5(tok), 2, 15))::BIGINT AS lo
        FROM u),
      v AS (
        SELECT doc_id, i,
          SUM(CASE WHEN (CASE WHEN i < 60 THEN (lo >> i) & 1
                              ELSE (hi >> (i - 60)) & 1 END) = 1
              THEN 1 ELSE -1 END) AS votes
        FROM h CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i)
        GROUP BY doc_id, i),
      s AS (
        SELECT doc_id,
          SUM(CASE WHEN votes > 0 THEN 1::HUGEINT << i ELSE 0::HUGEINT END) AS r
        FROM v GROUP BY doc_id),
      sg AS (
        SELECT doc_id,
          CAST(CASE WHEN r >= 9223372036854775808::HUGEINT
                    THEN r - 18446744073709551616::HUGEINT ELSE r END AS BIGINT) AS simhash
        FROM s)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
      FROM sg a JOIN sg b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 5""")
  )

  /** Batch 2 (odd doc_ids) staged as a stream-readable parquet dir once
    * per sf dir — q127's unbounded-ingest stand-in. */
  private val stagedDocsStream =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private def docsStreamDir(spark: org.apache.spark.sql.SparkSession,
      dir: String): String =
    stagedDocsStream.getOrElseUpdate(dir, {
      val t = ParityQueries.scratchDir("graft-docs-stream")
      Tables.load(spark, dir, "documents").filter(col("doc_id") % 2 =!= 0)
        .write.mode("overwrite").parquet(t)
      t
    })

  /** STREAMING dedup gate ([[Dedup.streamNearDupGate]]): batch 2 arrives
    * as an unbounded document stream and is checked AT INGEST against
    * batch 1's persisted MinHash index — stateless row-local signing +
    * banding, one stream-static band join, inline exact verify. The
    * q118 cadence moved from weekly batch to continuous: same index
    * artifact, same recall argument, and the oracle recomputes the
    * cross-batch pair set from scratch (new-vs-new pairs are out of
    * scope by design — the gate answers "is this NEW doc already in the
    * corpus", not intra-batch dedup, which q118/q26 cover). */
  val q127 = Q(
    "q127_stream_dedup_gate",
    (spark, dir) => {
      val idx = spark.read.parquet(minHashIndexDir(spark, dir))
      val schema = Tables.load(spark, dir, "documents").schema
      val stream = spark.readStream.schema(schema)
        .parquet(docsStreamDir(spark, dir))
      graft.streaming.EventsStream.replayToMemory(
        Dedup.streamNearDupGate(stream, idx, k = 32, rowsPerBand = 4,
          threshold = 0.5),
        "q127_stream_dedup_gate_sink",
        org.apache.spark.sql.streaming.OutputMode.Append(),
        statePartitions = Some(8))
      spark.table("q127_stream_dedup_gate_sink")
    },
    Some(s"""WITH sh AS (
        SELECT doc_id, unnest(list_distinct($sqlShingles)) AS shingle
        FROM documents),
      sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      inter AS (
        SELECT b.doc_id AS new_id, a.doc_id AS ref_id, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle
        WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
        GROUP BY 1, 2)
    SELECT new_id, ref_id,
      CAST(n_common AS DOUBLE) / (nn.n + nr.n - n_common) AS jaccard
    FROM inter
      JOIN sizes nn ON nn.doc_id = new_id
      JOIN sizes nr ON nr.doc_id = ref_id
    WHERE CAST(n_common AS DOUBLE) / (nn.n + nr.n - n_common) >= 0.5""")
  )

  /** Sequence-level near-dup verification: the q26 set-similarity pair
    * relation cross-checked with EXACT edit distance — the two standard
    * near-dup lenses (bag-of-shingles vs character sequence) agreeing is
    * the high-precision dedup signal; pairs passing Jaccard but failing
    * the edit bound would be shuffled-content false friends. Levenshtein
    * runs only on the VERIFIED pair relation (tiny by contract), never on
    * candidates — the quadratic-cost scalar stays off the wide path. Both
    * engines' `levenshtein` is the unit-cost classic, so `n_edits` is an
    * exact integer on each side. */
  val q139 = Q(
    "q139_editdist_near_dups",
    (spark, dir) => {
      val docs = Tables.load(spark, dir, "documents")
      val t = docs.select(col("doc_id"), col("text"))
      Dedup.jaccardPairsPrefixHash(docs, 0.5)
        .join(t.select(col("doc_id").as("doc_a"), col("text").as("text_a")),
          "doc_a")
        .join(t.select(col("doc_id").as("doc_b"), col("text").as("text_b")),
          "doc_b")
        .select(col("doc_a"), col("doc_b"), col("jaccard"),
          levenshtein(col("text_a"), col("text_b")).as("n_edits"),
          greatest(length(col("text_a")), length(col("text_b")))
            .as("max_len"))
        .filter(col("n_edits") <= 10)
    },
    Some(s"""WITH sh AS (
        SELECT doc_id, unnest(list_distinct($sqlShingles)) AS shingle
        FROM documents),
      sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      pj AS (
        SELECT doc_a, doc_b,
          CAST(n_common AS DOUBLE) / (na.n + nb.n - n_common) AS jaccard
        FROM inter
          JOIN sizes na ON na.doc_id = doc_a
          JOIN sizes nb ON nb.doc_id = doc_b
        WHERE CAST(n_common AS DOUBLE) / (na.n + nb.n - n_common) >= 0.5)
      SELECT doc_a, doc_b, jaccard,
        CAST(levenshtein(ta.text, tb.text) AS INTEGER) AS n_edits,
        CAST(greatest(length(ta.text), length(tb.text)) AS INTEGER) AS max_len
      FROM pj
        JOIN documents ta ON ta.doc_id = doc_a
        JOIN documents tb ON tb.doc_id = doc_b
      WHERE levenshtein(ta.text, tb.text) <= 10""")
  )

  val all: Seq[Q] = Seq(q20, q21, q22, q23, q24, q25, q26, q27, q28, q29,
    q35, q43, q44, q75, q77, q81, q83, q118, q126, q127, q139)
}
