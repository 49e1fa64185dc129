package graft.operators

import org.scalacheck.Gen

import graft.SparkSpec

/** Property checks for the round-7 operators: seeded random corpora with
  * collision-prone key/time domains (forcing ties, empty matches,
  * boundary gaps), each operator compared against an independent
  * brute-force reference computed in plain Scala. */
class Round7PropertySpec extends SparkSpec {

  import spark.implicits._

  private def t(minutes: Long) =
    new java.sql.Timestamp(1700000000000L + minutes * 60000L)

  private val params = Gen.Parameters.default.withSize(30)
  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(params, org.scalacheck.rng.Seed(seed)).get

  test("asof backward/forward/tolerance equal the brute-force reference") {
    val genRow = for {
      k <- Gen.choose(0, 3)
      m <- Gen.choose(0L, 120L)
    } yield (k, m)
    for (trial <- 1 to 6) {
      val ls = sample(Gen.listOfN(25, genRow), trial * 2L)
        .zipWithIndex.map { case ((k, m), i) => (i.toLong, k.toLong, t(m)) }
      val rs = sample(Gen.listOfN(15, genRow), trial * 2L + 1)
        .zipWithIndex.map { case ((k, m), i) => (1000L + i, k.toLong, t(m)) }
      val left = ls.toDF("id", "k", "lt")
      val right = rs.toDF("rid", "k", "rt")
      for (dir <- Seq("backward", "forward");
          tol <- Seq(None, Some("30 minutes"))) {
        val out = AsofJoin.asof(left, right, "k", "lt", "rt",
            Map("rid" -> "m"), direction = dir, tolerance = tol)
          .collect().map(r => r.getAs[Long]("id") ->
            Option(r.getAs[java.lang.Long]("m")).map(_.toLong)).toMap
        for ((id, k, lt) <- ls) {
          val cands = rs.filter(r => r._2 == k &&
            (if (dir == "backward") !r._3.after(lt) else !r._3.before(lt)))
          val expected = if (cands.isEmpty) None else {
            val times = cands.map(_._3.getTime)
            val bestT = if (dir == "backward") times.max else times.min
            // contract: nearest match FIRST, then the tolerance check —
            // out-of-window never falls back to an older/newer row
            if (tol.isDefined && math.abs(lt.getTime - bestT) > 30 * 60000L)
              None
            // exact-time ties: greatest attach tuple wins, either direction
            else Some(cands.filter(_._3.getTime == bestT).map(_._1).max)
          }
          assert(out(id) === expected,
            s"dir=$dir tol=$tol id=$id trial=$trial")
        }
      }
    }
  }

  test("sessionize equals a brute per-user sequential scan") {
    val genEvent = for {
      u <- Gen.choose(0, 2)
      m <- Gen.choose(0L, 600L)
      v <- Gen.choose(0, 9)
    } yield (u.toLong, m, v.toDouble) // integral values: double sums exact
    for (trial <- 1 to 6) {
      val evs = sample(Gen.listOfN(40, genEvent), 100L + trial)
      val df = evs.map { case (u, m, v) => (u, t(m), v) }
        .toDF("user_id", "ts", "value")
      val got = EventAnalytics.sessionize(df, gapMinutes = 30).collect()
        .map(r => (r.getAs[Long]("user_id"), r.getTimestamp(0).getTime,
          r.getTimestamp(1).getTime, r.getAs[Long]("n_events"),
          r.getAs[Double]("total_value"))).toSet
      val expected = evs.groupBy(_._1).flatMap { case (u, rows) =>
        val sorted = rows.map(e => (e._2 * 60000L, e._3)).sortBy(_._1)
        val sessions = sorted.tail.foldLeft(List(List(sorted.head))) {
          case (acc, ev) =>
            if (ev._1 - acc.head.head._1 >= 30 * 60000L) List(ev) :: acc
            else (ev :: acc.head) :: acc.tail
        }
        sessions.map { s =>
          val ts = s.map(_._1)
          (u, 1700000000000L + ts.min, 1700000000000L + ts.max + 30 * 60000L,
            s.size.toLong, s.map(_._2).sum)
        }
      }.toSet
      assert(got === expected, s"trial=$trial")
    }
  }

  test("exactGroupQuantiles equals sorted nearest-rank picks") {
    val genRow = for {
      g <- Gen.choose(0, 3)
      v <- Gen.choose(0L, 20L)
    } yield (s"g$g", v)
    val ps = Seq(0.1, 0.5, 0.9, 1.0)
    for (trial <- 1 to 6) {
      val rows = sample(Gen.listOfN(50, genRow), 200L + trial)
      val got = Quantiles
        .exactGroupQuantiles(rows.toDF("g", "v"), "g", "v", ps)
        .collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), (2 to 5).map(r.getLong).toList))).toMap
      val expected = rows.groupBy(_._1).map { case (g, rs) =>
        val sorted = rs.map(_._2).sorted
        val n = sorted.size
        g -> ((n.toLong,
          ps.map(p => sorted(math.ceil(p * n).toInt - 1)).toList))
      }
      assert(got === expected, s"trial=$trial")
    }
  }
}
