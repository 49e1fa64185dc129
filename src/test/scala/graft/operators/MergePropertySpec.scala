package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Randomized MERGE semantics check: [[TimeTravel.merge]] with the full
  * round-15 clause surface (ordered MATCHED cascade, BY SOURCE
  * update/delete, general ON narrowing the match, whole-row and
  * explicit-list inserts) must equal a ROW-BY-ROW Scala replay of SQL
  * MERGE semantics computed independently on collected rows — no
  * shared code path with the engine. Seeded: failures reproduce. */
class MergePropertySpec extends SparkSpec {

  import spark.implicits._
  import MergePropertySpec.R

  test("randomized MERGE ≡ independent row-by-row replay across ON variants") {
    val rnd = new scala.util.Random(20260816L)
    for (trial <- 1 to 6) {
      val tgtRows = rnd.shuffle((0L until 40L).toList).take(25)
        .map(k => R(k, s"p${k % 3}", rnd.nextInt(100).toDouble))
      val srcRows = rnd.shuffle((0L until 60L).toList).take(25)
        .map(k => R(k, s"p${k % 3}", rnd.nextInt(100).toDouble))
      def toDf(rs: Seq[R]) =
        rs.map(r => (r.k, r.part, r.v)).toDF("k", "part", "v")
      val useExtraOn = trial % 2 == 0
      val t = tmpDir(s"mergeprop$trial")
      TimeTravel.init(spark, t, toDf(tgtRows), "part")
      TimeTravel.merge(spark, t, toDf(srcRows), "k", "part",
        Seq(
          TimeTravel.MatchedUpdate(Some(col("tgt.v") < 40.0),
            Map("v" -> (col("src.v") + lit(100.0)))),
          TimeTravel.MatchedDelete(Some(col("tgt.v") >= 90.0)),
          TimeTravel.MatchedUpdate(None,
            Map("v" -> (col("tgt.v") + lit(0.5)))),
          TimeTravel.NotMatchedInsert(Some(col("v") % 2 === 0.0)),
          TimeTravel.NotMatchedInsert(None, Map(
            "k" -> col("k"), "part" -> col("part"),
            "v" -> (col("v") * 2))),
          TimeTravel.NotMatchedBySourceDelete(Some(col("tgt.v") < 5.0)),
          TimeTravel.NotMatchedBySourceUpdate(None,
            Map("v" -> (col("tgt.v") + lit(1000.0))))),
        extraOn = if (useExtraOn)
          Some(col("tgt.v") =!= col("src.v")) else None)
      val got = TimeTravel.readVersion(spark, t,
          TimeTravel.latestVersion(spark, t))
        .select("k", "part", "v").as[(Long, String, Double)]
        .collect().map { case (k, p2, v) => R(k, p2, v) }.toSet

      // ---- independent replay of SQL MERGE semantics ----
      val srcByKey = srcRows.map(r => r.k -> r).toMap
      def matches(tv: Double, s: R): Boolean =
        !useExtraOn || tv != s.v
      val keptTargets = tgtRows.flatMap { tr =>
        srcByKey.get(tr.k).filter(s => matches(tr.v, s)) match {
          case Some(s) => // MATCHED cascade, first accepting clause
            if (tr.v < 40.0) Some(tr.copy(v = s.v + 100.0))
            else if (tr.v >= 90.0) None // delete
            else Some(tr.copy(v = tr.v + 0.5))
          case None => // BY SOURCE cascade
            if (tr.v < 5.0) None // delete
            else Some(tr.copy(v = tr.v + 1000.0))
        }
      }
      val matchedKeys = tgtRows.filter(tr =>
        srcByKey.get(tr.k).exists(s => matches(tr.v, s))).map(_.k).toSet
      val inserted = srcRows.filterNot(s => matchedKeys(s.k)).map { s =>
        if (s.v % 2 == 0.0) s // whole-row insert
        else s.copy(v = s.v * 2) // explicit-list insert
      }
      val expected = (keptTargets ++ inserted).toSet
      assert(got === expected,
        s"trial $trial (extraOn=$useExtraOn): engine and replay disagree")
    }
  }
  /** The EXACT q201 clause mix, through the SQL surface
    * ([[graft.sql.GraftSql.exec]] MERGE → TimeTravel.merge): a general
    * ON band on the target, a conditional MATCHED UPDATE, an explicit
    * INSERT column list NULL-filling the unlisted column, and both
    * WHEN NOT MATCHED BY SOURCE forms — replayed against an
    * independent row-by-row Scala oracle across seeds, AND repeated on
    * ONE seed over fresh tables to flush any run-to-run
    * nondeterminism (the round-15 driver saw a q201 hash mismatch no
    * isolated rerun reproduced; this pins the clause algebra AND the
    * determinism of the whole-table BY SOURCE rewrite). */
  test("q201 clause mix: SQL MERGE ≡ independent replay, byte-stable across repeated runs") {
    final case class T(k: Long, q: String, st: String, pr: String,
      v: Double)
    def replay(tgt: Seq[T], src: Seq[T], band: Double): Set[T] = {
      val srcByKey = src.map(s => s.k -> s).toMap
      val kept = tgt.flatMap { tr =>
        if (srcByKey.contains(tr.k) && tr.v < band) // MATCHED (ON band)
          Some(if (tr.st != "P") tr.copy(v = tr.v + 10.0) else tr)
        else if (tr.st == "P") None // BY SOURCE conditional DELETE
        else Some(tr.copy(pr = "STALE")) // BY SOURCE unconditional UPDATE
      }
      val matchedSrcKeys = tgt.filter(tr =>
        srcByKey.contains(tr.k) && tr.v < band).map(_.k).toSet
      val ins = src.filterNot(s => matchedSrcKeys(s.k))
        .filter(_.st == "N") // NOT MATCHED condition
        .map(s => T(s.k, s.q, s.st, null, s.v + 5.0)) // explicit list
      (kept ++ ins).toSet
    }
    def run(seed: Long, rep: Int): Set[T] = {
      val rnd = new scala.util.Random(seed)
      val sts = Array("F", "O", "P")
      val tgtRows = (0L until 30L).map(k =>
        T(k, s"q${k % 4}", sts(rnd.nextInt(3)), s"pr${rnd.nextInt(3)}",
          rnd.nextInt(200).toDouble))
      val srcRows = rnd.shuffle((0L until 45L).toList).take(30).map(k =>
        T(k, s"q${k % 4}", if (k >= 30L) "N"
          else sts(rnd.nextInt(3)), s"pr${rnd.nextInt(3)}",
          rnd.nextInt(200).toDouble))
      val t = tmpDir(s"mergeq201-$seed-$rep")
      TimeTravel.init(spark, t, tgtRows.map(r =>
          (r.k, r.q, r.st, r.pr, r.v))
        .toDF("k", "q", "st", "pr", "v"), "q")
      srcRows.map(r => (r.k, r.q, r.st, r.pr, r.v))
        .toDF("k", "q", "st", "pr", "v")
        .createOrReplaceTempView("q201_prop_src")
      graft.sql.GraftSql.exec(spark, s"""MERGE INTO graft.`$t` t
        USING q201_prop_src s
        ON t.k = s.k AND t.v < 100.0
        WHEN MATCHED AND t.st <> 'P' THEN UPDATE SET v = t.v + 10.0
        WHEN NOT MATCHED AND s.st = 'N'
          THEN INSERT (k, q, st, v) VALUES (s.k, s.q, s.st, s.v + 5.0)
        WHEN NOT MATCHED BY SOURCE AND t.st = 'P' THEN DELETE
        WHEN NOT MATCHED BY SOURCE THEN UPDATE SET pr = 'STALE'""")
      val got = TimeTravel.readVersion(spark, t,
          TimeTravel.latestVersion(spark, t))
        .select("k", "q", "st", "pr", "v")
        .collect().map(r => T(r.getLong(0), r.getString(1),
          r.getString(2), if (r.isNullAt(3)) null else r.getString(3),
          r.getDouble(4))).toSet
      val rnd2 = new scala.util.Random(seed)
      val expTgt = (0L until 30L).map(k =>
        T(k, s"q${k % 4}", sts(rnd2.nextInt(3)), s"pr${rnd2.nextInt(3)}",
          rnd2.nextInt(200).toDouble))
      val expSrc = rnd2.shuffle((0L until 45L).toList).take(30).map(k =>
        T(k, s"q${k % 4}", if (k >= 30L) "N"
          else sts(rnd2.nextInt(3)), s"pr${rnd2.nextInt(3)}",
          rnd2.nextInt(200).toDouble))
      assert(got === replay(expTgt, expSrc, 100.0),
        s"seed $seed rep $rep: engine and replay disagree")
      got
    }
    // breadth: distinct seeds exercise different match/band/status mixes
    (1L to 4L).foreach(s => run(20260816L + s, 0))
    // depth: the SAME seed repeated on fresh tables — any
    // order-dependent bytes in the full-outer join, the BY SOURCE
    // whole-table rewrite, or commitRewrite shows up as a diff here
    val first = run(777L, 1)
    (2 to 5).foreach(rep => assert(run(777L, rep) === first,
      s"rep $rep: repeated identical merge produced a different table"))
  }
}

object MergePropertySpec {
  final case class R(k: Long, part: String, v: Double)
}
