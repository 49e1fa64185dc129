package graft.operators

import graft.SparkSpec

/** Grid-bucketed radius join: losslessness vs brute force on random
  * points, inclusive boundary, and single-survivor pair dedup. */
class GeoSpec extends SparkSpec {

  import spark.implicits._

  private def run(pts: Seq[(Long, Double, Double)], r: Double) =
    Geo.radiusPairs(pts.toDF("id", "lat", "lng"), r)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet

  private def brute(pts: Seq[(Long, Double, Double)], r: Double) =
    (for {
      (a, la, ga) <- pts; (b, lb, gb) <- pts
      if a < b && (ga - gb) * (ga - gb) + (la - lb) * (la - lb) <= r * r
    } yield (a, b)).toSet

  test("random points: grid join equals brute force at several radii") {
    var s = 2024L
    def next(): Double = {
      s = (s * 6364136223846793005L + 1442695040888963407L)
      ((s >>> 20) & 0xffffff).toDouble / 0xffffff
    }
    val pts = (1L to 300L).map(i => (i, next() * 180 - 90, next() * 360 - 180))
    for (r <- Seq(0.5, 2.0, 7.5)) {
      val got = run(pts, r)
      assert(got === brute(pts, r), s"r=$r")
      assert(got.nonEmpty || r == 0.5, s"degenerate test at r=$r")
    }
  }

  test("boundary: axis-aligned distance exactly r is included, just over excluded") {
    // distance exactly 1.0 on the lng axis, crossing a cell boundary
    val exact = Seq((1L, 0.0, 0.25), (2L, 0.0, 1.25))
    assert(run(exact, 1.0) === Set((1L, 2L)))
    val over = Seq((1L, 0.0, 0.25), (2L, 0.0, 1.2500001))
    assert(run(over, 1.0) === Set.empty)
    // pair inside ONE cell is also found (dedup keeps exactly one copy)
    val same = Seq((1L, 0.0, 0.1), (2L, 0.0, 0.2))
    assert(run(same, 1.0) === Set((1L, 2L)))
  }
}
