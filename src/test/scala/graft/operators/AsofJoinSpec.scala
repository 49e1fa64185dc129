package graft.operators

import graft.SparkSpec

/** As-of join semantics: latest right row with right.time <= left.time,
  * ties matching, missing history ⇒ nulls. */
class AsofJoinSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("attaches most recent prior right row per key; >= ties match; no history is null") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),   // before any right row
      (2L, 10L, ts("2024-01-01 12:00:00")),   // tie with r1 -> matches r1
      (3L, 10L, ts("2024-01-01 15:00:00")),   // after r2 -> matches r2
      (4L, 20L, ts("2024-01-01 09:00:00"))    // other key, no right rows
    ).toDF("id", "k", "t")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 12:00:00")),
      (200L, 10L, ts("2024-01-01 14:00:00"))
    ).toDF("rid", "k", "rt")

    val out = AsofJoin.asof(left, right, key = "k", leftTime = "t",
      rightTime = "rt", attach = Map("rid" -> "matched_rid"))
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[java.lang.Long]("matched_rid")).map(_.toLong)).toMap

    assert(out(1L) === None)
    assert(out(2L) === Some(100L))
    assert(out(3L) === Some(200L))
    assert(out(4L) === None)
  }

  test("attach columns come atomically from ONE right row (no tearing on nulls)") {
    val left = Seq((1L, 10L, ts("2024-01-01 15:00:00"))).toDF("id", "k", "t")
    val right = Seq(
      (Some(5L), Some(8L), 10L, ts("2024-01-01 12:00:00")),
      (None, Some(9L), 10L, ts("2024-01-01 14:00:00"))  // latest row: a is null
    ).toDF("a", "b", "k", "rt")
    val out = AsofJoin.asof(left, right, "k", "t", "rt",
      Map("a" -> "ra", "b" -> "rb")).collect().head
    // ASOF semantics: the t=14:00 row wins wholesale -> (null, 9), never a
    // mixed (5, 9) assembled from two different right rows
    assert(out.isNullAt(out.fieldIndex("ra")))
    assert(out.getAs[Long]("rb") === 9L)
  }

  test("forward direction: earliest following right row; <= ties match") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),   // before r1 -> matches r1
      (2L, 10L, ts("2024-01-01 12:00:00")),   // tie with r1 -> matches r1
      (3L, 10L, ts("2024-01-01 13:00:00")),   // between -> matches r2
      (4L, 10L, ts("2024-01-01 15:00:00"))    // after all -> null
    ).toDF("id", "k", "t")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 12:00:00")),
      (200L, 10L, ts("2024-01-01 14:00:00"))
    ).toDF("rid", "k", "rt")
    val out = AsofJoin.asof(left, right, "k", "t", "rt",
      Map("rid" -> "matched_rid"), direction = "forward")
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[java.lang.Long]("matched_rid")).map(_.toLong)).toMap
    assert(out(1L) === Some(100L))
    assert(out(2L) === Some(100L))
    assert(out(3L) === Some(200L))
    assert(out(4L) === None)
  }

  test("tolerance nulls matches beyond the window, keeps those inside") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 12:30:00")),   // 30 min after r1: inside
      (2L, 10L, ts("2024-01-01 14:00:00"))    // 2 h after r1: outside
    ).toDF("id", "k", "t")
    val right = Seq((100L, 10L, ts("2024-01-01 12:00:00"))).toDF("rid", "k", "rt")
    val out = AsofJoin.asof(left, right, "k", "t", "rt",
      Map("rid" -> "matched_rid"), tolerance = Some("1 hour"))
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[java.lang.Long]("matched_rid")).map(_.toLong)).toMap
    assert(out(1L) === Some(100L))
    assert(out(2L) === None) // nearest match exists but is out of tolerance
  }

  test("backward and forward agree with each other at exact-tie timestamps") {
    val left = Seq((1L, 10L, ts("2024-01-01 12:00:00"))).toDF("id", "k", "t")
    val right = Seq((100L, 10L, ts("2024-01-01 12:00:00"))).toDF("rid", "k", "rt")
    for (d <- Seq("backward", "forward")) {
      val out = AsofJoin.asof(left, right, "k", "t", "rt",
        Map("rid" -> "m"), direction = d).collect().head
      assert(out.getAs[Long]("m") === 100L, s"direction=$d")
    }
  }

  test("row count is preserved (left semantics, no duplication)") {
    val ev = graft.Tables.load(spark, sf, "events")
    val signups = ev.filter($"event_type" === "signup")
      .select($"user_id", $"ts", $"event_id")
    val joined = AsofJoin.asof(ev.select($"event_id", $"user_id", $"ts"),
      signups, "user_id", "ts", "ts", Map("event_id" -> "sid"))
    assert(joined.count() === ev.count())
  }
}
