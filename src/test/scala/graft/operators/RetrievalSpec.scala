package graft.operators

import graft.SparkSpec

/** RRF fusion invariants: hand-computed scores, per-list rank surfacing,
  * single-list degeneration, and deterministic tie-breaks. */
class RetrievalSpec extends SparkSpec {

  import spark.implicits._

  private def list(rows: (Long, Int)*) =
    rows.toDF("id", "rank")

  test("rrfFuse: hand-computed two-list fusion with partial overlap") {
    val lex = list(1L -> 1, 2L -> 2, 3L -> 3)
    val vec = list(2L -> 1, 4L -> 2)
    val out = Retrieval.rrfFuse(Seq("lex" -> lex, "vec" -> vec), k = 10)
      .collect()
    def c(r: Int): Long = math.round(1e6 / (60 + r))
    val byId = out.map(r => r.getAs[Long]("id") ->
      (Option(r.getAs[Integer]("rank_lex")), Option(r.getAs[Integer]("rank_vec")),
        r.getAs[Long]("rrf_1e6"))).toMap
    assert(byId(2L) === ((Some(2), Some(1), c(2) + c(1))))
    assert(byId(1L) === ((Some(1), None, c(1))))
    assert(byId(4L) === ((None, Some(2), c(2))))
    assert(byId(3L) === ((Some(3), None, c(3))))
    // item on both lists outranks every single-list item here
    val ranks = out.map(r => r.getAs[Long]("id") -> r.getAs[Int]("rank")).toMap
    assert(ranks(2L) === 1)
    // ties (same rrf) break on ascending id: c(1) alone vs c(1) alone
    assert(ranks(1L) < ranks(4L) === (c(1) > c(2)) || ranks(1L) < ranks(4L))
  }

  test("rrfFuse: k truncates and rank is contiguous from 1") {
    val a = list((1L to 30L).map(i => i -> i.toInt): _*)
    val out = Retrieval.rrfFuse(Seq("a" -> a), k = 5).collect()
    assert(out.length === 5)
    assert(out.map(_.getAs[Int]("rank")).sorted.toSeq === (1 to 5))
    // single list: fused order equals the input order
    assert(out.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("id")).toSeq
      === (1L to 5L))
  }

  test("rrfFuse: duplicate id WITHIN a list contributes once, at its best rank") {
    // id=1 appears twice on list a (ranks 1 and 3); the fused score must
    // count only the min-rank contribution, matching rank_a = 1 — not
    // silently sum both rows
    val a = list(1L -> 1, 2L -> 2, 1L -> 3)
    val clean = list(1L -> 1, 2L -> 2)
    val dup = Retrieval.rrfFuse(Seq("a" -> a), k = 10)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Int]("rank_a"),
        r.getAs[Long]("rrf_1e6"))).sortBy(_._1).toSeq
    val ref = Retrieval.rrfFuse(Seq("a" -> clean), k = 10)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Int]("rank_a"),
        r.getAs[Long]("rrf_1e6"))).sortBy(_._1).toSeq
    assert(dup === ref)
    assert(dup.find(_._1 == 1L).get._3 === math.round(1e6 / 61))
  }

  test("rrfFuse: equal-score ties break on ascending id") {
    // two disjoint lists, same ranks → identical scores pairwise
    val a = list(10L -> 1, 11L -> 2)
    val b = list(5L -> 1, 6L -> 2)
    val out = Retrieval.rrfFuse(Seq("a" -> a, "b" -> b), k = 4)
      .collect().sortBy(_.getAs[Int]("rank"))
    assert(out.map(_.getAs[Long]("id")).toSeq === Seq(5L, 10L, 6L, 11L))
  }
}
