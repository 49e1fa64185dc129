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
}

object MergePropertySpec {
  final case class R(k: Long, part: String, v: Double)
}
