package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

import graft.Tables
import graft.streaming.EventsStream

/** Reference-parity scalar surface (SURVEY.md §2.3/§2.4 P1–P7, F1–F4) as a
  * declared query over the synthetic corpus, plus the Structured Streaming
  * pipeline verified against a batch oracle. */
object ParityQueries {

  /** P1 rename / P3 1-based element_at with NULL out-of-range / P5 cast /
    * P6 coalesce / P7 literals / F3 IS NOT NULL / F4 IN-list — the exact
    * operator set of the reference's schema.sql layer, exercised over
    * `documents` so the DuckDB oracle can verify it. */
  val q38 = Q(
    "q38_projection_parity",
    (spark, dir) => {
      import spark.implicits._
      val toks = split(trim($"text"), "\\s+")
      Tables.load(spark, dir, "documents")
        .filter($"lang".isin("en", "de", "fr") && $"text".isNotNull)
        .select(
          $"doc_id".as("id"),
          element_at(toks, 1).as("first_token"),
          element_at(toks, 3).as("third_token"),
          element_at(toks, 9999).as("token_overflow"),
          coalesce($"source", lit("")).as("source_c"),
          $"n_chars".cast(StringType).as("n_chars_str"),
          lit(true).as("flag"),
          lit(0.0).as("zero"))
    },
    Some("""SELECT doc_id AS id,
      string_split_regex(trim(text), '\s+')[1] AS first_token,
      string_split_regex(trim(text), '\s+')[3] AS third_token,
      string_split_regex(trim(text), '\s+')[9999] AS token_overflow,
      COALESCE(source, '') AS source_c,
      CAST(n_chars AS VARCHAR) AS n_chars_str,
      true AS flag, 0.0 AS zero
    FROM documents
    WHERE lang IN ('en', 'de', 'fr') AND text IS NOT NULL""")
  )

  /** The Structured Streaming tumbling-window pipeline, replayed to
    * completion over the events table and verified against a plain batch
    * SQL oracle — streaming and batch must agree exactly (decimal-exact
    * sums make micro-batch boundaries invisible). */
  private val stagedEvents =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private val scratchDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  locally {
    // one JVM-exit sweep for every scratch dir this object created:
    // Bench samples each query several times, so without cleanup each run
    // would leak multiple corpus-sized parquet copies under /tmp
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      scratchDirs.forEach { root =>
        try {
          java.nio.file.Files.walk(root)
            .sorted(java.util.Comparator.reverseOrder())
            .forEach(p => p.toFile.delete())
        } catch { case _: Throwable => () } // best-effort
      }))
  }

  /** Fresh temp directory, recursively deleted at JVM exit. */
  private[queries] def scratchDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    scratchDirs.add(p)
    p.toString
  }

  /** Stage the ns-timestamp events as a stream-readable µs parquet dir
    * once per sf dir (re-runs in the same JVM replay the same input). */
  private def stagedEventsDir(spark: org.apache.spark.sql.SparkSession,
      dir: String): String =
    stagedEvents.getOrElseUpdate(dir, {
      val t = scratchDir("graft-events-replay")
      Tables.load(spark, dir, "events").write.mode("overwrite").parquet(t)
      t
    })

  val q39 = Q(
    "q39_stream_hourly",
    (spark, dir) => {
      val tmp = stagedEventsDir(spark, dir)
      EventsStream.replayToMemory(
        EventsStream.tumblingCounts(EventsStream.fromParquetDir(spark, tmp)),
        "q39_stream_hourly_sink", OutputMode.Complete(),
        statePartitions = Some(8), noDataBatch = false)
      spark.table("q39_stream_hourly_sink")
    },
    Some("""SELECT date_trunc('hour', ts) AS window_start, event_type,
      COUNT(*) AS n_events,
      CAST(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2""")
  )

  /** Streaming deduplication replayed over the events table: distinct
    * (user_id, event_type) keys with watermark-bounded state. The output
    * is a SET of keys, so it equals the batch DISTINCT oracle regardless
    * of arrival order or micro-batch boundaries. */
  val q54 = Q(
    "q54_stream_dedup",
    (spark, dir) => {
      val tmp = stagedEventsDir(spark, dir)
      EventsStream.replayToMemory(
        EventsStream.dedupKeys(EventsStream.fromParquetDir(spark, tmp),
          Seq("user_id", "event_type")),
        "q54_stream_dedup_sink", OutputMode.Append(),
        statePartitions = Some(8), noDataBatch = false)
      spark.table("q54_stream_dedup_sink")
    },
    Some("SELECT DISTINCT user_id, event_type FROM events")
  )

  /** Gap-based session windows replayed over events: per-user sessions
    * with a 30-minute inactivity gap, counts + decimal-exact value sums.
    * The oracle is the classic batch gaps-and-islands formulation: break
    * on inter-event gap ≥ 30 min, running-sum the breaks into session
    * ids, aggregate. Session boundaries are exact in both engines — event
    * timestamps carry microsecond entropy (zero whole-second rows, zero
    * exact-gap successive pairs at any sf), so strict-vs-inclusive merge
    * semantics at the gap boundary cannot diverge. */
  /** The batch gaps-and-islands sessionization both q59 and q65 verify
    * against: break on inter-event gap ≥ 30 min, running-sum the breaks
    * into session ids, aggregate. */
  private[queries] val sessionsOracle = """WITH o AS (
        SELECT user_id, ts, value,
          CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                 OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                      >= INTERVAL '30 minutes'
               THEN 1 ELSE 0 END AS brk
        FROM events),
      g AS (
        SELECT user_id, ts, value,
          SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                         ROWS UNBOUNDED PRECEDING) AS grp
        FROM o)
    SELECT MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           user_id, COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS total_value
    FROM g GROUP BY user_id, grp"""

  val q59 = Q(
    "q59_stream_sessions",
    (spark, dir) => {
      val tmp = stagedEventsDir(spark, dir)
      EventsStream.replayToMemory(
        EventsStream.sessionCounts(EventsStream.fromParquetDir(spark, tmp),
          gap = "30 minutes", watermark = "1 hour"),
        "q59_stream_sessions_sink", OutputMode.Complete(),
        statePartitions = Some(8), noDataBatch = false)
      spark.table("q59_stream_sessions_sink")
    },
    Some(sessionsOracle)
  )

  /** Staged events plus ONE far-future sentinel event (user_id −1, 30 days
    * past max ts): in Append mode a session only emits once the watermark
    * passes its end, so a bounded replay would withhold every session in
    * the final watermark horizon. The sentinel advances the watermark past
    * all real sessions; its own session is never finalized and therefore
    * never reaches the sink. */
  private val stagedSentinelEvents =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private def stagedSentinelEventsDir(spark: org.apache.spark.sql.SparkSession,
      dir: String): String =
    stagedSentinelEvents.getOrElseUpdate(dir, {
      import spark.implicits._
      val t = scratchDir("graft-events-sentinel")
      val ev = Tables.load(spark, dir, "events")
      val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
      val far = new java.sql.Timestamp(maxTs.getTime + 30L * 24 * 3600 * 1000)
      val sentinel = Seq((-1L, far, -1L, "sentinel", 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      ev.unionByName(sentinel).write.mode("overwrite").parquet(t)
      t
    })

  /** [[q59]]'s session pipeline in APPEND mode — the bounded-state contract
    * an unbounded deployment runs on: each session emits exactly once when
    * the watermark passes its end, and its state is evicted (Complete mode
    * retains the whole result table forever — fine for a bounded replay,
    * not at stream scale). Verified against the same batch oracle; the
    * sentinel row (see [[stagedSentinelEventsDir]]) exists only to flush
    * the final watermark horizon and never appears in the output — the
    * user_id filter is a guard, asserted redundant by StreamingSpec. */
  val q65 = Q(
    "q65_stream_sessions_append",
    (spark, dir) => {
      val tmp = stagedSentinelEventsDir(spark, dir)
      EventsStream.replayToMemory(
        EventsStream.sessionCounts(EventsStream.fromParquetDir(spark, tmp),
          gap = "30 minutes", watermark = "1 hour"),
        "q65_stream_sessions_append_sink", OutputMode.Append(),
        statePartitions = Some(8))
      spark.table("q65_stream_sessions_append_sink")
        .filter(col("user_id") >= 0)
    },
    Some(sessionsOracle)
  )

  /** Staged events carved into 6 contiguous TIME-SLICED parquet files
    * (plus q65's far-future sentinel), each slice's files stamped with an
    * explicit strictly-increasing mtime ([[stampSliceMtimes]]) so the
    * file-stream source replays them oldest-slice-first. At
    * maxFilesPerTrigger=2 the replay becomes multiple micro-batches whose
    * intermediate watermarks finalize and EVICT sessions mid-replay — the
    * unbounded-deployment state path, vs the single-batch replays where
    * the watermark only advances once at the end. The ntile global sort is
    * replay-INPUT staging (one eager pass, localCheckpoint'd), not query
    * work — the same contract as [[stagedEventsDir]]'s staging writes. */
  private val stagedSlicedEvents =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** Stamp every not-yet-stamped parquet part file in `dir` with the
    * given epoch-second mtime. Explicit `Files.setLastModifiedTime` with
    * an increasing counter, NOT a sleep between writes: on filesystems
    * with coarse (1 s) mtime granularity a short sleep can leave slices
    * sharing an mtime, making the file-stream source's arrival order —
    * and thus the multi-batch watermark path being exercised —
    * nondeterministic. The absolute epoch is an arbitrary fixed past
    * instant; the source's maxFileAge is relative to the NEWEST file's
    * mtime, so only the ordering matters. */
  private def stampSliceMtimes(dir: String,
      stamped: scala.collection.mutable.Set[String], epochSec: Long): Unit = {
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    new java.io.File(dir).listFiles().toSeq
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .filterNot(f => stamped.contains(f.getName))
      .foreach { f =>
        Files.setLastModifiedTime(Paths.get(f.getPath),
          FileTime.from(java.time.Instant.ofEpochSecond(epochSec)))
        stamped += f.getName
      }
  }
  private def stagedSlicedEventsDir(spark: org.apache.spark.sql.SparkSession,
      dir: String): String =
    stagedSlicedEvents.getOrElseUpdate(dir, {
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      val t = scratchDir("graft-events-sliced")
      val ev = Tables.load(spark, dir, "events")
      val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
      val sliced = ev
        .withColumn("slice",
          ntile(6).over(Window.orderBy(col("ts"), col("event_id"))))
        .localCheckpoint()
      val stamped = scala.collection.mutable.Set.empty[String]
      for (i <- 1 to 6) {
        sliced.filter(col("slice") === i).drop("slice")
          .coalesce(1).write.mode("append").parquet(t)
        stampSliceMtimes(t, stamped, 1600000000L + i)
      }
      val far = new java.sql.Timestamp(maxTs.getTime + 30L * 24 * 3600 * 1000)
      Seq((-1L, far, -1L, "sentinel", 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(t)
      stampSliceMtimes(t, stamped, 1600000000L + 7)
      t
    })

  /** [[q65]]'s Append-mode session pipeline replayed MULTI-BATCH: the
    * time-sliced staging above at `maxFilesPerTrigger = 2` yields ≥3
    * micro-batches, so sessions finalize against intermediate watermarks
    * and state is evicted while later slices are still arriving — the
    * batch-boundary-invariance contract StreamingSpec proves, here
    * driver-checked against the SAME batch oracle (round-6 verdict item
    * 8: the multi-batch watermark path was spec-only). */
  val q104 = Q(
    "q104_stream_sessions_multibatch",
    (spark, dir) => {
      val tmp = stagedSlicedEventsDir(spark, dir)
      EventsStream.replayToMemory(
        EventsStream.sessionCounts(
          EventsStream.fromParquetDir(spark, tmp, maxFilesPerTrigger = Some(2)),
          gap = "30 minutes", watermark = "1 hour"),
        "q104_stream_sessions_multibatch_sink", OutputMode.Append(),
        statePartitions = Some(8))
      spark.table("q104_stream_sessions_multibatch_sink")
        .filter(col("user_id") >= 0)
    },
    Some(sessionsOracle)
  )

  /** The custom stateful operator (mapGroupsWithState running per-user
    * totals) replayed over events and driver-checked on its deterministic
    * projection: per-user event counts. Update mode emits one row per
    * user per micro-batch that touched it, and counts only grow, so
    * max(n_events) per user is the final state regardless of how the
    * replay splits into batches. total_value stays out of the checked
    * output: the state fold adds doubles in group-iterator order, which
    * is not deterministic across shuffles (StreamingSpec covers it with a
    * tolerance instead). */
  val q60 = Q(
    "q60_stream_user_totals",
    (spark, dir) => {
      import spark.implicits._
      val tmp = stagedEventsDir(spark, dir)
      EventsStream.replayToMemory(
        EventsStream.runningUserTotals(
          EventsStream.fromParquetDir(spark, tmp).as[EventsStream.Event]).toDF(),
        "q60_stream_user_totals_sink", OutputMode.Update(),
        statePartitions = Some(8), noDataBatch = false)
      spark.table("q60_stream_user_totals_sink")
        .groupBy($"user_id")
        .agg(max($"n_events").as("n_events"))
    },
    Some("SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id")
  )

  /** Stream-stream interval self-join replayed over events: per-user
    * follow-up pairs within 5 minutes, watermark-bounded buffers on both
    * sides. The (lead_id, follow_id) set hash-matches the batch interval
    * join oracle. */
  val q57 = Q(
    "q57_stream_follow_join",
    (spark, dir) => {
      val tmp = stagedEventsDir(spark, dir)
      val src = EventsStream.fromParquetDir(spark, tmp)
      EventsStream.replayToMemory(
        EventsStream.followWithin(src, EventsStream.fromParquetDir(spark, tmp)),
        "q57_stream_follow_sink", OutputMode.Append(),
        statePartitions = Some(8), noDataBatch = false)
      spark.table("q57_stream_follow_sink")
    },
    Some("""SELECT a.event_id AS lead_id, b.event_id AS follow_id
      FROM events a JOIN events b
        ON a.user_id = b.user_id
       AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE""")
  )

  /** [[q57]]'s interval self-join as a LEFT OUTER stream-stream join
    * ([[EventsStream.followWithinOuter]]): every event emits, follow_id
    * NULL when nothing followed within 5 minutes. Unmatched rows only
    * emit when the watermark passes lead_ts + horizon, so the replay
    * stages the far-future sentinel (q65's flush trick) to close the
    * final horizon; the sentinel's own rows are filtered by id. Verified
    * against the batch LEFT JOIN oracle — matched pairs AND null-matched
    * leads both hash-checked. */
  val q107 = Q(
    "q107_stream_follow_outer",
    (spark, dir) => {
      val tmp = stagedSentinelEventsDir(spark, dir)
      val src = EventsStream.fromParquetDir(spark, tmp)
      EventsStream.replayToMemory(
        EventsStream.followWithinOuter(src,
          EventsStream.fromParquetDir(spark, tmp)),
        "q107_stream_follow_outer_sink", OutputMode.Append(),
        statePartitions = Some(8))
      spark.table("q107_stream_follow_outer_sink")
        .filter(col("lead_id") >= 0)
    },
    Some("""SELECT a.event_id AS lead_id, b.event_id AS follow_id
      FROM events a LEFT JOIN events b
        ON a.user_id = b.user_id
       AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE""")
  )

  /** FULL OUTER stream-stream join ([[EventsStream.followWithinFull]]):
    * q107's lead-follow interval join with BOTH null-extension
    * directions — unmatched leads AND unmatched follows each emit on
    * watermark passage (the q65 sentinel advances the final horizon).
    * The sentinel surfaces on either side of the output, so the filter
    * NULL-safely drops negative ids on both columns; the oracle is the
    * batch FULL JOIN under the identical interval predicate. */
  val q149 = Q(
    "q149_stream_follow_full",
    (spark, dir) => {
      val tmp = stagedSentinelEventsDir(spark, dir)
      val src = EventsStream.fromParquetDir(spark, tmp)
      EventsStream.replayToMemory(
        EventsStream.followWithinFull(src,
          EventsStream.fromParquetDir(spark, tmp)),
        "q149_stream_follow_full_sink", OutputMode.Append(),
        statePartitions = Some(8))
      spark.table("q149_stream_follow_full_sink")
        .filter(coalesce(col("lead_id"), lit(0L)) >= 0 &&
          coalesce(col("follow_id"), lit(0L)) >= 0)
    },
    Some("""SELECT a.event_id AS lead_id, b.event_id AS follow_id
      FROM events a FULL JOIN events b
        ON a.user_id = b.user_id
       AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE""")
  )

  /** Salted two-phase aggregation over the (low-cardinality, therefore
    * skew-prone) event_type key — result-identical to the direct groupBy,
    * which is exactly what the oracle verifies. */
  val q40 = Q(
    "q40_salted_agg",
    (spark, dir) => {
      import spark.implicits._
      graft.operators.Skew.saltedSumCount(
        Tables.load(spark, dir, "events"),
        key = $"event_type", value = $"value",
        distributor = $"event_id", saltFactor = 16)
        .withColumnRenamed("k", "event_type")
    },
    Some("""SELECT event_type,
      CAST(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS total,
      COUNT(*) AS n
    FROM events GROUP BY event_type""")
  )

  /** End-to-end training-data curation: quality gate → exact dedup (min
    * doc_id survives) → per-language corpus stats. The composition the
    * text operators exist for, verified as one oracle query. */
  val q41 = Q(
    "q41_curation_pipeline",
    (spark, dir) => {
      import spark.implicits._
      val toks = split(trim($"text"), "\\s+")
      val ttr = size(array_distinct(toks)).cast(DoubleType) / size(toks)
      val stop = (graft.operators.TextAnalysis.wordOccurrences($"text", "the") +
        graft.operators.TextAnalysis.wordOccurrences($"text", "a"))
        .cast(DoubleType) / size(toks)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(md5($"text")).orderBy($"doc_id")
      Tables.load(spark, dir, "documents")
        .withColumn("quality", ttr * lit(0.7) + (lit(1.0) - stop) * lit(0.3))
        .filter($"quality" >= 0.5)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("total_chars"))
    },
    Some(s"""WITH toks AS (
        SELECT doc_id, lang, n_chars, text,
          CAST(len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS DOUBLE)
            / len(string_split_regex(trim(text), '\\s+')) AS ttr,
          CAST(len(list_filter(string_split_regex(trim(text), '\\s+'), t -> t = 'the'))
             + len(list_filter(string_split_regex(trim(text), '\\s+'), t -> t = 'a'))
            AS DOUBLE) / len(string_split_regex(trim(text), '\\s+')) AS stop
        FROM documents),
      scored AS (
        SELECT *, ttr * 0.7 + (1.0 - stop) * 0.3 AS quality FROM toks),
      deduped AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM scored WHERE quality >= 0.5)
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM deduped WHERE rn = 1 GROUP BY lang""")
  )

  /** Sketch-based approximate aggregates — the cardinality/quantile tools
    * a 100 TB profiling pass actually uses (HyperLogLog++, KLL-style
    * quantiles; mergeable, one pass, bounded memory) — as a TOLERANCE-BAND
    * contract the driver hash-checks (formerly a rows-only exemption: raw
    * sketch outputs are engine-specific and can never hash-match an
    * oracle). The query computes each sketch AND the exact value in one
    * pass and emits whether the sketch landed inside a documented band;
    * the oracle recomputes the exact halves in DuckDB and states the
    * expected verdict (every band holds). A sketch drifting out of band
    * flips a boolean and fails the hash — a checked contract, not an
    * exemption.
    *
    * Bands (generous multiples of the configured accuracy, so the check
    * never flakes yet still catches a broken sketch):
    *  - HLL++ at rsd=0.02: |approx−exact|/exact ≤ 0.10 (5× the rsd; for
    *    HLL the estimate is within 5σ with overwhelming probability).
    *  - percentile_approx at accuracy=1000 (rank error ≤ 0.1%): the
    *    returned value must lie within the exact interpolated [p45, p55]
    *    band for the median and [p98.5, p99.5] for p99 (a ±5% / ±0.5%
    *    rank band — 50× the guaranteed rank error). */
  val q42 = Q(
    "q42_approx_profile",
    (spark, dir) => {
      import spark.implicits._
      Tables.load(spark, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          approx_count_distinct($"l_partkey", rsd = 0.02).as("ap"),
          approx_count_distinct($"l_orderkey", rsd = 0.02).as("ao"),
          percentile_approx($"l_extendedprice", lit(0.5), lit(1000)).as("p50"),
          percentile_approx($"l_extendedprice", lit(0.99), lit(1000)).as("p99"),
          countDistinct($"l_partkey").as("n_parts"),
          countDistinct($"l_orderkey").as("n_orders"),
          expr("percentile(l_extendedprice, array(0.45, 0.55, 0.985, 0.995))")
            .as("pb"))
        .select($"l_returnflag", $"n_parts", $"n_orders",
          (abs($"ap" - $"n_parts").cast("double") / $"n_parts" <= 0.10)
            .as("parts_in_band"),
          (abs($"ao" - $"n_orders").cast("double") / $"n_orders" <= 0.10)
            .as("orders_in_band"),
          ($"p50" >= $"pb" (0) && $"p50" <= $"pb" (1)).as("p50_in_band"),
          ($"p99" >= $"pb" (2) && $"p99" <= $"pb" (3)).as("p99_in_band"))
    },
    Some("""SELECT l_returnflag,
      COUNT(DISTINCT l_partkey) AS n_parts,
      COUNT(DISTINCT l_orderkey) AS n_orders,
      true AS parts_in_band, true AS orders_in_band,
      true AS p50_in_band, true AS p99_in_band
    FROM lineitem GROUP BY l_returnflag""")
  )

  /** The exactly-determined half of the profiling pass, split out of q42:
    * exact distinct counts, row counts, min/max, hash-checked value-
    * for-value. q42 covers the sketch half via its tolerance-band
    * contract; this query pins the exact baseline both engines agree on. */
  val q58 = Q(
    "q58_exact_profile",
    (spark, dir) => {
      import spark.implicits._
      Tables.load(spark, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          count(lit(1)).as("n_rows"),
          countDistinct($"l_partkey").as("n_parts"),
          countDistinct($"l_orderkey").as("n_orders"),
          min($"l_extendedprice").as("min_price"),
          max($"l_extendedprice").as("max_price"))
    },
    Some("""SELECT l_returnflag, COUNT(*) AS n_rows,
      COUNT(DISTINCT l_partkey) AS n_parts,
      COUNT(DISTINCT l_orderkey) AS n_orders,
      MIN(l_extendedprice) AS min_price,
      MAX(l_extendedprice) AS max_price
    FROM lineitem GROUP BY l_returnflag""")
  )

  /** Sliding-window aggregation (1 h windows, 30 min slide): each event
    * lands in two overlapping windows. Spark's window() generates them
    * natively; the oracle rebuilds the same epoch-aligned windows with
    * time_bucket + a 2-row unnest. */
  val q45 = Q(
    "q45_sliding_windows",
    (spark, dir) => {
      import spark.implicits._
      Tables.load(spark, dir, "events")
        .groupBy(window($"ts", "1 hour", "30 minutes"), $"event_type")
        .agg(count(lit(1)).as("n_events"),
          sum($"value".cast(org.apache.spark.sql.types.DecimalType(28, 10)))
            .cast(org.apache.spark.sql.types.DoubleType).as("total_value"))
        .select($"window.start".as("window_start"), $"event_type",
          $"n_events", $"total_value")
    },
    Some("""WITH b AS (
        SELECT event_type, value,
          time_bucket(INTERVAL '30 minutes', ts) AS bucket FROM events),
      e AS (SELECT event_type, value,
          bucket - INTERVAL 30 MINUTE * k AS window_start
        FROM b, unnest([0, 1]) t(k))
    SELECT window_start, event_type, COUNT(*) AS n_events,
      CAST(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS total_value
    FROM e GROUP BY 1, 2""")
  )

  /** Correlated scalar subquery through the spark.sql surface (the user's
    * SQL entry point — same text runs on both engines). */
  val q46 = Q(
    "q46_correlated_subquery",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      spark.sql("""SELECT c_custkey, c_name,
          (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders,
          (SELECT MAX(o_totalprice) FROM orders WHERE o_custkey = c_custkey) AS max_order
        FROM customer""")
    },
    Some("""SELECT c_custkey, c_name,
      (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders,
      (SELECT MAX(o_totalprice) FROM orders WHERE o_custkey = c_custkey) AS max_order
    FROM customer""")
  )

  /** Parquet sink roundtrip, driver-checked: write `documents` to a fresh
    * zstd parquet directory, read it back, and emit an order-insensitive
    * content summary (row count + bit_xor of a per-row md5-derived 60-bit
    * hash over every column). The oracle computes the same summary over
    * the ORIGINAL table — equality means the write→read cycle preserved
    * every row and every value byte-for-byte, which is the K1 sink
    * contract (codec included) that was previously only spec-tested.
    * bit_xor, not sum: order-insensitive AND overflow-free for any corpus
    * size. */
  val q85 = Q(
    "q85_parquet_roundtrip",
    (spark, dir) => {
      val tmp = scratchDir("graft-roundtrip")
      Tables.load(spark, dir, "documents")
        .write.mode("overwrite").option("compression", "zstd").parquet(tmp)
      spark.read.parquet(tmp)
        .select(graft.operators.TextAnalysis.tokenHash60(
          concat_ws("|", col("doc_id").cast(StringType), col("text"),
            col("lang"), col("source"), col("n_chars").cast(StringType)))
          .as("h"))
        .agg(count(lit(1)).as("n_rows"), expr("bit_xor(h)").as("content_xor"))
    },
    Some("""SELECT COUNT(*) AS n_rows,
      bit_xor(('0x' || substr(md5(
        concat_ws('|', CAST(doc_id AS VARCHAR), text, lang, source,
                  CAST(n_chars AS VARCHAR))), 1, 15))::BIGINT) AS content_xor
    FROM documents""")
  )

  /** q54's streaming dedup through the PARQUET FILE SINK instead of the
    * memory sink: the sink an unbounded deployment writes (exactly-once
    * via the sink commit log), driver-checked by reading the committed
    * files back — the result must be the same batch-DISTINCT set whichever
    * sink carried it. Covers the streaming file-sink path (commit log,
    * file manifest read-back) that the memory-sink replays can't. */
  val q86 = Q(
    "q86_stream_parquet_sink",
    (spark, dir) => {
      val tmp = stagedEventsDir(spark, dir)
      val out = scratchDir("graft-stream-sink")
      val ck = scratchDir("graft-stream-sink-ck")
      EventsStream.replayToParquet(
        EventsStream.dedupKeys(EventsStream.fromParquetDir(spark, tmp),
          Seq("user_id", "event_type")),
        out, ck, statePartitions = Some(8), noDataBatch = false)
      spark.read.parquet(out)
    },
    Some("SELECT DISTINCT user_id, event_type FROM events")
  )

  /** Stream-static broadcast enrichment ([[EventsStream.enrichedTumblingCounts]]):
    * events join the `customer` dimension (user_id → c_custkey) per
    * micro-batch with zero join state, then roll up per (hour window,
    * market segment) behind the watermark. Verified against the batch
    * join+group oracle — the stream-static join must neither drop nor
    * duplicate events across the broadcast. */
  val q89 = Q(
    "q89_stream_enrich_dim",
    (spark, dir) => {
      val tmp = stagedEventsDir(spark, dir)
      EventsStream.replayToMemory(
        EventsStream.enrichedTumblingCounts(
          EventsStream.fromParquetDir(spark, tmp),
          Tables.load(spark, dir, "customer")
            .select(col("c_custkey"), col("c_mktsegment")),
          streamKey = "user_id", dimKey = "c_custkey",
          rollupCol = "c_mktsegment"),
        "q89_stream_enrich_dim_sink", OutputMode.Complete(),
        statePartitions = Some(8), noDataBatch = false)
      spark.table("q89_stream_enrich_dim_sink")
    },
    Some("""SELECT date_trunc('hour', ts) AS window_start,
        c_mktsegment, COUNT(*) AS n_events,
        CAST(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE)
          AS total_value
      FROM events JOIN customer ON user_id = c_custkey
      GROUP BY 1, 2""")
  )

  /** Custom sessionization via flatMapGroupsWithState
    * ([[EventsStream.closedSessions]]): zero-or-more emissions per
    * invocation, EventTimeTimeout-driven session close, and a custom
    * payload (first/last event type of each session) the built-in
    * session_window cannot produce. Same gaps-and-islands oracle family
    * as q59/q65 plus arg_min/arg_max for the path payload; the sentinel
    * staging (see [[stagedSentinelEventsDir]]) flushes the final
    * watermark horizon so every real session's timeout fires. */
  val q90 = Q(
    "q90_stream_custom_sessions",
    (spark, dir) => {
      import spark.implicits._
      val tmp = stagedSentinelEventsDir(spark, dir)
      EventsStream.replayToMemory(
        EventsStream.closedSessions(
          EventsStream.fromParquetDir(spark, tmp).as[EventsStream.Event],
          gapMinutes = 30, watermark = "1 hour").toDF(),
        "q90_stream_custom_sessions_sink", OutputMode.Append(),
        statePartitions = Some(8))
      spark.table("q90_stream_custom_sessions_sink")
        .filter(col("user_id") >= 0)
    },
    Some("""WITH o AS (
        SELECT user_id, ts, event_type,
          CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                 OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                      >= INTERVAL '30 minutes'
               THEN 1 ELSE 0 END AS brk
        FROM events),
      g AS (
        SELECT user_id, ts, event_type,
          SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                         ROWS UNBOUNDED PRECEDING) AS grp
        FROM o)
      SELECT user_id, MIN(ts) AS session_start,
        MAX(ts) + INTERVAL '30 minutes' AS session_end,
        COUNT(*) AS n_events,
        arg_min(event_type, ts) AS first_type,
        arg_max(event_type, ts) AS last_type
      FROM g GROUP BY user_id, grp""")
  )

  /** q90's custom sessionization on Spark 4's `transformWithState` API
    * ([[EventsStream.SessionProcessor]]): named typed state + explicit
    * moved-on-extension horizon timers instead of the fMGWS GroupState
    * blob, under the RocksDB store the new API requires. SAME oracle as
    * q90 — the fifth verified path through the one session contract
    * (q59 Complete, q65 Append, q90 fMGWS, q104/q122 multi-batch, this).
    */
  val q152 = Q(
    "q152_stream_sessions_tws",
    (spark, dir) => {
      import spark.implicits._
      val tmp = stagedSentinelEventsDir(spark, dir)
      EventsStream.replayToMemory(
        EventsStream.closedSessionsTws(
          EventsStream.fromParquetDir(spark, tmp).as[EventsStream.Event],
          gapMinutes = 30, watermark = "1 hour").toDF(),
        "q152_stream_sessions_tws_sink", OutputMode.Append(),
        statePartitions = Some(8),
        stateStoreProvider = Some(EventsStream.RocksDbProvider))
      spark.table("q152_stream_sessions_tws_sink")
        .filter(col("user_id") >= 0)
    },
    q90.oracle
  )

  /** Two-generation evolving parquet table, staged once per sf dir:
    * generation 1 = even doc_ids under the original 5-column documents
    * schema; generation 2 = odd doc_ids with an ADDED quality_score
    * column (a pure function of n_chars so the oracle can recompute
    * it). Both generations land in ONE directory — the weekly-export
    * layout a schema change produces in place. */
  private val stagedEvolved =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private def evolvedDocsDir(spark: org.apache.spark.sql.SparkSession,
      dir: String): String =
    stagedEvolved.getOrElseUpdate(dir, {
      val t = scratchDir("graft-evolved-docs")
      val docs = Tables.load(spark, dir, "documents")
      docs.filter(col("doc_id") % 2 === 0)
        .write.mode("append").parquet(t)
      docs.filter(col("doc_id") % 2 =!= 0)
        .withColumn("quality_score", col("n_chars").cast(DoubleType) / 1000.0)
        .write.mode("append").parquet(t)
      t
    })

  /** Schema-evolution read path ([[graft.etl.SchemaEvolution.readMerged]]):
    * the two-generation table read as ONE relation — generation-1 rows
    * NULL-backfill the added column. The oracle is the explicit DuckDB
    * union of the two generations, so the merged schema, the backfill,
    * and the row set all hash-check. SchemaEvolutionSpec proves the
    * pinned-schema read ([[graft.etl.SchemaEvolution.readAs]], the
    * zero-discovery-cost production path) returns the identical
    * relation. */
  val q123 = Q(
    "q123_schema_evolution",
    (spark, dir) => graft.etl.SchemaEvolution
      .readMerged(spark, evolvedDocsDir(spark, dir))
      .select(col("doc_id"), col("lang"), col("n_chars"), col("quality_score")),
    Some("""SELECT doc_id, lang, n_chars, CAST(NULL AS DOUBLE) AS quality_score
      FROM documents WHERE doc_id % 2 = 0
      UNION ALL
      SELECT doc_id, lang, n_chars, CAST(n_chars AS DOUBLE) / 1000.0 AS quality_score
      FROM documents WHERE doc_id % 2 = 1""")
  )

  /** q104's multi-batch session replay under the ROCKSDB state store
    * ([[EventsStream.RocksDbProvider]]) — the provider an unbounded
    * deployment runs, where session state lives on executor-local disk
    * with changelog checkpoints instead of the default HDFS-backed
    * heap map. The store is an implementation detail below the dataflow:
    * this query shares q104's staging, watermark path, AND oracle, so
    * the driver hash-checks that swapping the provider changes nothing
    * (StreamingSpec asserts the same provider-vs-provider identity on
    * the checkpoint-resume path). */
  val q122 = Q(
    "q122_stream_sessions_rocksdb",
    (spark, dir) => {
      val tmp = stagedSlicedEventsDir(spark, dir)
      EventsStream.replayToMemory(
        EventsStream.sessionCounts(
          EventsStream.fromParquetDir(spark, tmp, maxFilesPerTrigger = Some(2)),
          gap = "30 minutes", watermark = "1 hour"),
        "q122_stream_sessions_rocksdb_sink", OutputMode.Append(),
        statePartitions = Some(8),
        stateStoreProvider = Some(EventsStream.RocksDbProvider))
      spark.table("q122_stream_sessions_rocksdb_sink")
        .filter(col("user_id") >= 0)
    },
    Some(sessionsOracle)
  )

  /** Streaming upsert sink ([[EventsStream.replayToUpsert]]): the sliced
    * multi-batch replay drives an Update-mode last-event-per-user
    * aggregation (max over the (ts, event_id, event_type) struct — a
    * total order, ts ties broken by event_id) whose changed keys MERGE
    * into a user-bucketed parquet table every micro-batch via the q133
    * copy-on-write operator. The oracle recomputes the final
    * last-write-wins state from the raw log, so batch sequencing, merge
    * idempotency, and the aggregation's total order all hash-check. */
  val q136 = Q(
    "q136_stream_upsert",
    (spark, dir) => {
      val tmp = stagedSlicedEventsDir(spark, dir)
      val tableDir = scratchDir("graft-upsert-table")
      val ck = scratchDir("graft-upsert-ck")
      // 3 files/trigger → 3 micro-batches (6 slices + sentinel): one
      // table-create + two genuine merges exercises the upsert path at
      // ~half the per-batch fixed cost of the 4-batch q104 cadence
      val agg = EventsStream.fromParquetDir(spark, tmp, maxFilesPerTrigger = Some(3))
        .groupBy(col("user_id"))
        .agg(max(struct(col("ts"), col("event_id"), col("event_type")))
          .as("last"))
        .select(col("user_id"), col("last.ts").as("last_ts"),
          col("last.event_id").as("last_event_id"),
          col("last.event_type").as("last_type"),
          pmod(col("user_id"), lit(8L)).cast("string").as("part"))
      EventsStream.replayToUpsert(agg, tableDir, ck,
        keyCol = "user_id", partCol = "part", statePartitions = Some(8))
      spark.read.parquet(tableDir).filter(col("user_id") >= 0)
        .select(col("user_id"), col("last_ts"), col("last_event_id"),
          col("last_type"))
    },
    // explicit tie-break (ts DESC, event_id DESC) mirroring the Spark
    // side's max(struct(ts, event_id, …)) — DuckDB's arg_max(x, ts) is
    // unspecified on equal ts, so the oracle must pin the composite order
    Some("""SELECT user_id, ts AS last_ts, event_id AS last_event_id,
        event_type AS last_type
      FROM (SELECT *, row_number() OVER (PARTITION BY user_id
              ORDER BY ts DESC, event_id DESC) AS rn FROM events)
      WHERE rn = 1""")
  )

  /** Streaming ingest into the VERSIONED table
    * ([[graft.streaming.EventsStream.replayToVersioned]]): q136's
    * last-per-key micro-batch cadence, but every batch lands as its own
    * [[graft.operators.TimeTravel]] COMMIT — v1 = the first batch's
    * init, v2/v3 = the later batches' copy-on-write merges — so the
    * stream's history is time-travelable from manifests. The query reads
    * the LATEST version back (manifest-pruned, never a directory
    * listing) and verifies against the same from-raw-log last-write-wins
    * oracle as q136: batch sequencing, per-commit manifest integrity,
    * and the merge arithmetic all hash-check; an intermediate version
    * leaking into the final manifest (or a lost commit) shifts rows.
    * StreamingSpec additionally proves the intermediate versions stay
    * readable and the final content equals the mutable-sink replay. */
  val q161 = Q(
    "q161_stream_versioned",
    (spark, dir) => {
      import graft.operators.TimeTravel
      val tmp = stagedSlicedEventsDir(spark, dir)
      val tableDir = scratchDir("graft-versioned-table")
      val ck = scratchDir("graft-versioned-ck")
      val agg = EventsStream.fromParquetDir(spark, tmp, maxFilesPerTrigger = Some(3))
        .groupBy(col("user_id"))
        .agg(max(struct(col("ts"), col("event_id"), col("event_type")))
          .as("last"))
        .select(col("user_id"), col("last.ts").as("last_ts"),
          col("last.event_id").as("last_event_id"),
          col("last.event_type").as("last_type"),
          pmod(col("user_id"), lit(8L)).cast("string").as("part"))
      EventsStream.replayToVersioned(agg, tableDir, ck,
        keyCol = "user_id", partCol = "part", statePartitions = Some(8))
      TimeTravel.readVersion(spark, tableDir,
          TimeTravel.latestVersion(spark, tableDir))
        .filter(col("user_id") >= 0)
        .select(col("user_id"), col("last_ts"), col("last_event_id"),
          col("last_type"))
    },
    // same contract as q136: last-write-wins per user with the explicit
    // (ts DESC, event_id DESC) composite tie-break
    Some("""SELECT user_id, ts AS last_ts, event_id AS last_event_id,
        event_type AS last_type
      FROM (SELECT *, row_number() OVER (PARTITION BY user_id
              ORDER BY ts DESC, event_id DESC) AS rn FROM events)
      WHERE rn = 1""")
  )

  /** APPEND-ONLY streaming ingest into the versioned table
    * ([[graft.streaming.EventsStream.replayToVersionedAppend]] →
    * [[graft.operators.TimeTravel.append]]): the raw event stream lands
    * one blind append COMMIT per micro-batch — no merge, no partition
    * rewrite, per-trigger cost independent of table size (the
    * insert-only production twin of q161's merge-per-batch sink). The
    * query reads the LATEST version back and hash-checks every event
    * row against the raw table — a lost batch, a double-delivered
    * batch, or an append that clobbered earlier files all shift rows —
    * plus two in-band verdicts: the replay landed as MULTIPLE commits
    * (streaming, not one big write) and at least one partition holds
    * several files (the genuine small-file accumulation
    * [[graft.operators.TimeTravel.compact]] exists to fold — q162
    * proves the fold; this proves the accumulation is real). The
    * sentinel row (user_id −1) steers only the slicing and is filtered
    * like the other replay queries. */
  val q164 = Q(
    "q164_stream_append_versioned",
    (spark, dir) => {
      import graft.operators.TimeTravel
      val tmp = stagedSlicedEventsDir(spark, dir)
      val tableDir = scratchDir("graft-append-table")
      val ck = scratchDir("graft-append-ck")
      val src = EventsStream
        .fromParquetDir(spark, tmp, maxFilesPerTrigger = Some(3))
        .withColumn("part", pmod(col("user_id"), lit(8L)).cast("string"))
      EventsStream.replayToVersionedAppend(src, tableDir, ck,
        partCol = "part")
      val latest = TimeTravel.latestVersion(spark, tableDir)
      val fragmented = TimeTravel.filesAt(spark, tableDir, latest)
        .groupBy(f => f.substring(0, f.indexOf('/')))
        .values.exists(_.size > 1)
      TimeTravel.readVersion(spark, tableDir, latest)
        .filter(col("user_id") >= 0)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"),
          lit(latest >= 2).as("multi_commit"),
          lit(fragmented).as("fragmented_before_compact"))
    },
    Some("""SELECT event_id, ts, user_id, event_type,
        TRUE AS multi_commit, TRUE AS fragmented_before_compact
      FROM events""")
  )

  /** DECLARATIVE versioned streaming sink
    * ([[graft.streaming.VersionedTableSink]] — q164's append-ingest
    * contract through `writeStream.format("graft-versioned")` instead
    * of a foreachBatch helper): the raw event stream lands one blind
    * append COMMIT per micro-batch with the (streamId, batchId) txn
    * marker inside each record, exactly-once under re-delivery, zero
    * imperative glue. Hash-checks every event row against the raw
    * table (a lost or double-delivered batch shifts rows) with the
    * in-band multi-commit verdict; exactly-once restart recovery and
    * the upsert mode are VersionedSourceSpec's. */
  val q176 = Q(
    "q176_stream_sink_versioned",
    (spark, dir) => {
      import graft.operators.TimeTravel
      val tmp = stagedSlicedEventsDir(spark, dir)
      val tableDir = scratchDir("graft-sink-table")
      val ck = scratchDir("graft-sink-ck")
      val src = EventsStream
        .fromParquetDir(spark, tmp, maxFilesPerTrigger = Some(3))
        .withColumn("part", pmod(col("user_id"), lit(8L)).cast("string"))
      graft.streaming.VersionedStream.replayToTable(src, tableDir, ck,
        partCol = "part")
      val latest = TimeTravel.latestVersion(spark, tableDir)
      TimeTravel.readVersion(spark, tableDir, latest)
        .filter(col("user_id") >= 0)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), lit(latest >= 2).as("multi_commit"))
    },
    Some("""SELECT event_id, ts, user_id, event_type,
        TRUE AS multi_commit
      FROM events""")
  )

  val all: Seq[Q] =
    Seq(q38, q39, q40, q41, q42, q45, q46, q54, q57, q58, q59, q60, q65, q85,
      q86, q89, q90, q104, q107, q122, q123, q136, q149, q152, q161, q164,
      q176)
}
