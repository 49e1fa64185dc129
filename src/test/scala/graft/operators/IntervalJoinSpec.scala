package graft.operators

import graft.SparkSpec

/** Bucketed interval-overlap invariants: hand cases at bucket boundaries,
  * once-per-pair counting across shared buckets, half-open ends, and
  * equivalence with the naive quadratic count. */
class IntervalJoinSpec extends SparkSpec {

  import spark.implicits._

  private def ts(min: Long) =
    new java.sql.Timestamp(min * 60000L)

  private def run(rows: Seq[(Long, Long, Long)], bucketMicros: Long = 3600L * 1000 * 1000) =
    IntervalJoin.overlapCounts(
      rows.map { case (id, s, e) => (id, ts(s), ts(e)) }
        .toDF("id", "s", "e"),
      idCols = Seq("id"), startCol = "s", endCol = "e",
      bucketMicros = bucketMicros)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("n_overlaps"))
      .toMap

  test("hand case: long interval spanning many buckets counted once per pair") {
    // a: [0m, 600m) spans 10 hourly buckets; b: [300m, 400m) inside it;
    // c: [9000m, 9060m) far away
    val out = run(Seq((1L, 0L, 600L), (2L, 300L, 400L), (3L, 9000L, 9060L)))
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 0L))
  }

  test("half-open ends: touching intervals do not overlap") {
    val out = run(Seq((1L, 0L, 60L), (2L, 60L, 120L)))
    assert(out === Map(1L -> 0L, 2L -> 0L))
    // one-minute genuine overlap does
    val out2 = run(Seq((1L, 0L, 61L), (2L, 60L, 120L)))
    assert(out2 === Map(1L -> 1L, 2L -> 1L))
  }

  test("degenerate intervals (end <= start) are empty: overlap nothing, kept at 0") {
    // b is empty (e == s) strictly INSIDE a; c is inverted (e < s) —
    // under half-open semantics both overlap nothing and must neither
    // count nor explode spurious descending-sequence buckets
    val out = run(Seq((1L, 0L, 600L), (2L, 300L, 300L), (3L, 500L, 100L),
      (4L, 100L, 200L)))
    assert(out === Map(1L -> 1L, 2L -> 0L, 3L -> 0L, 4L -> 1L))
  }

  test("pseudo-random intervals: bucketed count equals the naive quadratic count") {
    var s = 99L
    def next(): Long = { s = (s * 1103515245L + 12345L) % 2147483648L; s }
    val iv = (1L to 120L).map { id =>
      val st = next() % 3000; (id, st, st + 10 + next() % 200)
    }
    val naive = iv.map { case (id, s1, e1) =>
      id -> iv.count { case (id2, s2, e2) =>
        id2 != id && s1 < e2 && s2 < e1 }.toLong
    }.toMap
    assert(run(iv) === naive)
    // a different bucket width must not change the answer
    assert(run(iv, bucketMicros = 7L * 60 * 1000 * 1000) === naive)
  }
}
