package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

/** Randomized equivalences for the round-9 operators: BPE training vs a
  * driver-side reference implementation of the merge loop, encode-under-
  * merges vs reference encoding, and versioned-table reads vs a replayed
  * in-memory state machine. */
class Round9PropertySpec extends SparkSpec {

  import spark.implicits._

  private val params = Gen.Parameters.default.withSize(30)
  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(params, org.scalacheck.rng.Seed(seed)).get

  // -- driver-side BPE reference --------------------------------------------

  /** Greedy left-to-right merge of one pair in a symbol list. */
  private def mergePair(syms: List[String], l: String,
      r: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += l + r; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toList
  }

  /** Reference trainer: (merges, final symbolization). Pair counts weigh
    * overlapping positions; argmax under (count desc, left asc, right
    * asc). */
  private def refTrain(words: Seq[(String, Long)],
      n: Int): List[(String, String, Long)] = {
    var state = words.map { case (w, f) => (w.toList.map(_.toString), f) }
    val merges = scala.collection.mutable.ListBuffer.empty[(String, String, Long)]
    var continue = true
    while (continue && merges.length < n) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- state; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      if (counts.isEmpty) continue = false
      else {
        val ((l, r), c) = counts.toSeq
          .minBy { case ((l, r), c) => (-c, l, r) }
        merges += ((l, r, c))
        state = state.map { case (syms, f) => (mergePair(syms, l, r), f) }
      }
    }
    merges.toList
  }

  private val genWords: Gen[List[(String, Long)]] = for {
    alpha <- Gen.choose(2, 4) // tiny alphabet → dense pair collisions/ties
    n <- Gen.choose(3, 14)
    ws <- Gen.listOfN(n, for {
      len <- Gen.choose(1, 7)
      cs <- Gen.listOfN(len, Gen.choose('a', ('a' + alpha - 1).toChar))
      f <- Gen.choose(1L, 9L)
    } yield (cs.mkString, f))
  } yield ws.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toList

  test("bpeTrain equals the reference merge loop on random corpora (ties included)") {
    for (trial <- 1 to 8) {
      val words = sample(genWords, 900L + trial)
      val got = Corpus.bpeTrain(words.toDF("word", "freq"), nMerges = 6)
        .orderBy("rank").collect()
        .map(r => (r.getAs[String]("left_sym"), r.getAs[String]("right_sym"),
          r.getAs[Long]("pair_n"))).toList
      assert(got === refTrain(words, 6), s"trial=$trial words=$words")
    }
  }

  test("bpeEncode equals reference encoding under the learned merges, and concatenates losslessly") {
    for (trial <- 1 to 5) {
      val words = sample(genWords, 7700L + trial)
      val merges = refTrain(words, 5).map { case (l, r, _) => (l, r) }
      val got = words.toDF("word", "freq")
        .select(col("word"), Corpus.bpeEncode(col("word"), merges).as("syms"))
        .collect().map(r => r.getAs[String]("word") ->
          r.getSeq[String](1).toList).toMap
      words.foreach { case (w, _) =>
        val ref = merges.foldLeft(w.toList.map(_.toString)) {
          case (s, (l, r)) => mergePair(s, l, r)
        }
        assert(got(w) === ref, s"trial=$trial word=$w")
        assert(got(w).mkString === w) // symbols always re-concatenate
      }
    }
  }

  // -- versioned table vs replayed state machine ----------------------------

  test("random upsert/delete sequences: every version equals the replayed state") {
    for (trial <- 1 to 3) {
      val dir = tmpDir(s"tt-prop-$trial")
      val genBatch: Gen[List[(Long, String, Double)]] =
        Gen.listOfN(6, for {
          id <- Gen.choose(1L, 12L)
          p <- Gen.oneOf("p1", "p2", "p3")
          v <- Gen.choose(1, 999)
        } yield (id, p, v.toDouble))
      // state per version, replayed driver-side
      var state = sample(genBatch, 5000L + trial)
        .groupBy(_._1).map(_._2.head).toList
      TimeTravel.init(spark, dir, state.toDF("id", "part", "v"), "part")
      val states = scala.collection.mutable.ListBuffer(state)
      for (step <- 1 to 4) {
        if (step % 2 == 1) {
          val ups = sample(genBatch, trial * 100L + step)
            .groupBy(_._1).map(_._2.head).toList
          TimeTravel.upsert(spark, dir, ups.toDF("id", "part", "v"),
            "id", "part")
          state = ups ++ state.filterNot(s => ups.exists(_._1 == s._1))
          states += state
        } else {
          val dels = sample(Gen.listOfN(3, Gen.choose(1L, 12L)),
            trial * 100L + step).distinct
          val prevVersions = states.length
          val v = TimeTravel.delete(spark, dir, dels.toDF("id"), "id", "part")
          state = state.filterNot(s => dels.contains(s._1))
          // a delete matching nothing commits no version — track only
          // real commits (the filter was a no-op in that case anyway)
          if (v > prevVersions) states += state
        }
      }
      states.zipWithIndex.foreach { case (want, i) =>
        val got = TimeTravel.readVersion(spark, dir, i + 1)
          .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("part"),
            r.getAs[Double]("v"))).toSet
        assert(got === want.toSet, s"trial=$trial version=${i + 1}")
      }
    }
  }
}
