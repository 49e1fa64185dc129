package graft.operators

import graft.SparkSpec

/** Nearest-rank arithmetic on hand distributions with known answers. */
class QuantilesSpec extends SparkSpec {

  import spark.implicits._

  test("nearest-rank picks: ceil(p·n) over 1..10; constant group collapses") {
    val df = ((1L to 10L).map(("a", _)) ++ Seq(("b", 5L), ("b", 5L), ("b", 5L)))
      .toDF("g", "v")
    val out = Quantiles.exactGroupQuantiles(df, "g", "v")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    // n=10: ranks ceil(2.5)=3, ceil(5)=5, ceil(7.5)=8, ceil(9.5)=10
    assert(out("a") === ((10L, 3L, 5L, 8L, 10L)))
    // every rank lands on the one distinct value
    assert(out("b") === ((3L, 5L, 5L, 5L, 5L)))
  }

  test("duplicate-heavy histogram ranks by cumulative count, not value index") {
    // values: 1×1, 2×4, 9×1 → n=6; p50 rank ceil(3)=3 → cum(1)=1,
    // cum(2)=5 ≥ 3 → p50 = 2; p95 rank ceil(5.7)=6 → 9
    val df = (Seq(1L) ++ Seq.fill(4)(2L) ++ Seq(9L)).map(("g", _)).toDF("g", "v")
    val r = Quantiles.exactGroupQuantiles(df, "g", "v", Seq(0.5, 0.95))
      .collect().head
    assert(r.getLong(1) === 6L)
    assert(r.getLong(2) === 2L)
    assert(r.getLong(3) === 9L)
  }

  test("rejects out-of-range percentiles") {
    intercept[IllegalArgumentException](
      Quantiles.exactGroupQuantiles(Seq(("g", 1L)).toDF("g", "v"), "g", "v",
        Seq(1.5)))
  }

  test("bucketByGlobalQuantiles: even quartiles on 1..8, ties close the lower bucket") {
    val df = (1L to 8L).toDF("v")
    val out = Quantiles.bucketByGlobalQuantiles(df, "v", 4)
      .collect().map(r => r.getAs[Long]("v") -> r.getAs[Int]("bucket")).toMap
    assert(out === Map(1L -> 1, 2L -> 1, 3L -> 2, 4L -> 2,
      5L -> 3, 6L -> 3, 7L -> 4, 8L -> 4))
    // all-equal values: every row lands in bucket 1 (cut equals the value)
    val ties = Quantiles.bucketByGlobalQuantiles(
      Seq(5L, 5L, 5L, 5L).toDF("v"), "v", 2)
      .collect().map(_.getAs[Int]("bucket"))
    assert(ties.toSet === Set(1))
    // cut helper columns must not leak into the output schema
    assert(Quantiles.bucketByGlobalQuantiles(df, "v", 4).columns.toSeq
      === Seq("v", "bucket"))
  }
}
