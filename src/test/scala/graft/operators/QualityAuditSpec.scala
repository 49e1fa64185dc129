package graft.operators

import graft.SparkSpec

/** Constraint-audit semantics on a hand-built table: NULL handling per
  * check type, pass/fail verdicts, and single-pass reporting. */
class QualityAuditSpec extends SparkSpec {

  import spark.implicits._
  import QualityAudit._

  test("audit: per-check counts and verdicts on planted violations") {
    val df = Seq[(java.lang.Long, String, java.lang.Double)](
      (1L, "en", 5.0), (2L, "en", 50.0), (2L, "xx", 5.0), // dup id, bad lang
      (3L, null, 200.0),                                  // null lang, oob
      (4L, "de", null.asInstanceOf[java.lang.Double]))    // null value
      .toDF("id", "lang", "v")
    val out = QualityAudit.audit(df, Seq(
      Complete("lang"), Unique(Seq("id")), Bounds("v", 0.0, 100.0),
      InSet("lang", Seq("en", "de"))))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(out("complete_lang") === ((4L, 5L, false)))
    assert(out("unique_id") === ((4L, 5L, false)))
    // bounds: 4 non-null values, one (200) out of range
    assert(out("bounds_v") === ((3L, 4L, false)))
    // inset: 4 non-null langs, one ('xx') outside the domain
    assert(out("inset_lang") === ((3L, 4L, false)))
  }

  test("audit: a clean table passes every check") {
    val df = Seq((1L, "en", 1.0), (2L, "de", 2.0)).toDF("id", "lang", "v")
    val out = QualityAudit.audit(df, Seq(
      Complete("lang"), Unique(Seq("id")), Bounds("v", 0.0, 10.0),
      InSet("lang", Seq("en", "de")))).collect()
    assert(out.length === 4 && out.forall(_.getBoolean(3)))
  }

  test("audit: rejects duplicate check names") {
    val df = Seq((1L, "en")).toDF("id", "lang")
    intercept[IllegalArgumentException](
      QualityAudit.audit(df, Seq(Complete("lang"), Complete("lang"))))
  }

  test("audit: an EMPTY table passes with boolean (not NULL) verdicts") {
    val empty = Seq.empty[(Long, String, Double)].toDF("id", "lang", "v")
    val out = QualityAudit.audit(empty, Seq(
      Complete("lang"), Unique(Seq("id")), Bounds("v", 0.0, 1.0),
      InSet("lang", Seq("en")))).collect()
    assert(out.length === 4)
    out.foreach { r =>
      assert(!r.isNullAt(3), r.toString) // pass is a real boolean
      assert(r.getBoolean(3), r.toString)
      assert(r.getLong(1) === 0L && r.getLong(2) === 0L)
    }
  }
}
