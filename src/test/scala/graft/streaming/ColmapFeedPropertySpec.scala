package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TimeTravel

/** Randomized LOG-MODEL check of column mapping × incremental
  * consumption: seeded commit sequences mixing appends with renames
  * (fresh names and rename-backs), consumed by BOTH batch feeds
  * (`readAppendsSince` / `readChangesSince`, from the start and from
  * random mid-history cursors) AND the admission-capped streaming
  * source across a restart that itself straddles another rename. The
  * invariants the round-14/15 fixes promised, now property-tested
  * instead of hand-staged:
  *
  *  - every appended VALUE arrives under the delivery version's
  *    logical name with its value intact — NEVER NULL-filled, however
  *    many renames sit between the write and the read;
  *  - a window from any cursor delivers exactly the commits after it;
  *  - the restarted stream is exactly-once: no gap, no re-delivery,
  *    with `maxRowsPerTrigger` splitting the backlog into several
  *    micro-batches (the cap is exercised, not just configured).
  */
class ColmapFeedPropertySpec extends SparkSpec {

  import spark.implicits._

  test("randomized rename/append logs: batch feeds and the capped stream deliver every value exactly once, never NULL-filled") {
    for (seed <- 1L to 3L) {
      val rnd = new scala.util.Random(20260900L + seed)
      val t = tmpDir(s"colmap-prop-$seed")
      var colName = "a0"
      TimeTravel.init(spark, t,
        Seq((0L, "p0", -1L)).toDF("k", "p", colName), "p")
      var nextK = 1L
      // version -> the rows (k, value) that commit appended
      var byVersion = Map.empty[Int, Seq[(Long, Long)]]
      var renames = 0
      def appendRows(step: Int): Unit = {
        val rows = (0 until 1 + rnd.nextInt(3)).map { _ =>
          val k = nextK; nextK += 1
          (k, s"p${k % 2}", k * 1000 + step.toLong)
        }
        val v = TimeTravel.append(spark, t,
          rows.toDF("k", "p", colName), "p")
        byVersion += v -> rows.map(r => (r._1, r._3))
      }
      for (step <- 1 to 12) {
        rnd.nextInt(4) match {
          case 0 if colName != "a0" && rnd.nextBoolean() =>
            // rename BACK to the original name (the identity-mapping
            // special case the reserved-name guard explicitly allows)
            TimeTravel.renameColumn(spark, t, colName, "a0")
            colName = "a0"; renames += 1
          case 0 =>
            TimeTravel.renameColumn(spark, t, colName, s"a$step")
            colName = s"a$step"; renames += 1
          case _ => appendRows(step)
        }
      }
      // force the shape the fixes target: at least one rename with
      // appends on BOTH sides of it
      TimeTravel.renameColumn(spark, t, colName, "amid")
      colName = "amid"; renames += 1
      appendRows(13)
      val vStream = TimeTravel.latestVersion(spark, t)

      // ---- batch feeds: full window and a random mid cursor ----
      def expectedAfter(cursor: Int): Map[Long, Long] =
        byVersion.filter(_._1 > cursor).values.flatten.toMap
      for (cursor <- Seq(1, 1 + rnd.nextInt(vStream))) {
        val exp = expectedAfter(cursor)
        val feed = TimeTravel.readAppendsSince(spark, t, cursor)
        assert(feed.columns.contains(colName),
          s"seed $seed cursor $cursor: feed lacks the end name")
        assert(feed.filter(col(colName).isNull).count() === 0,
          s"seed $seed cursor $cursor: NULL-filled values in the feed")
        assert(feed.select(col("k"), col(colName))
          .as[(Long, Long)].collect().toMap === exp,
          s"seed $seed cursor $cursor ($renames renames): feed diverges")
        val cdc = TimeTravel.readChangesSince(spark, t, cursor)
          .filter(col(TimeTravel.ChangeTypeCol) === "insert")
        assert(cdc.select(col("k"), col(colName))
          .as[(Long, Long)].collect().toMap === exp,
          s"seed $seed cursor $cursor: CDC feed diverges")
      }

      // ---- the stream: capped run, then a restart across ANOTHER
      // rename with a backlog written under the OLD name ----
      val out = tmpDir(s"colmap-prop-out-$seed")
      val ck = tmpDir(s"colmap-prop-ck-$seed")
      def run(): Unit = EventsStream.replayToParquet(
        VersionedStream.readStream(spark, t, sinceVersion = Some(1),
          maxRowsPerTrigger = Some(2L)), out, ck)
      run()
      val firstName = colName
      appendRows(14) // backlog under the old name…
      TimeTravel.renameColumn(spark, t, colName, "afinal")
      colName = "afinal"; renames += 1
      appendRows(15) // …and fresh rows under the new one
      run()
      // exactly-once across both runs, and every value rode a name —
      // the first run's files carry the then-pinned name, the second
      // run's the new one; COALESCE proves no row was NULL-filled
      val merged = spark.read.option("mergeSchema", "true").parquet(out)
      val valueCol = coalesce(
        (Seq(firstName, "afinal").distinct ++ Nil).map(n =>
          if (merged.columns.contains(n)) col(n)
          else lit(null).cast("long")): _*)
      val got = merged.select(col("k"), valueCol.as("v"))
        .as[(Long, Long)].collect()
      val exp = expectedAfter(1)
      assert(got.length === exp.size,
        s"seed $seed: stream delivered ${got.length} rows, " +
          s"expected ${exp.size} (exactly-once violated)")
      assert(got.toMap === exp,
        s"seed $seed ($renames renames): stream content diverges")
      // the cap actually split the backlog into several micro-batches
      val batches = Option(new java.io.File(ck, "offsets").list())
        .map(_.count(_.forall(_.isDigit))).getOrElse(0)
      assert(batches > 2,
        s"seed $seed: expected the 2-row cap to split delivery, " +
          s"got $batches batches")
    }
  }
}
