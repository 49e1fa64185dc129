package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Corpus analytics/transform invariants: top-k ordering, overlap
  * symmetry-by-construction, scrub losslessness on the survivor side, and
  * chunk coverage arithmetic. */
class CorpusSpec extends SparkSpec {

  private def docs = Tables.load(spark, sf, "documents")

  test("ngramTopK: k rows, count-descending, n_docs <= n_occurrences") {
    val rows = Corpus.ngramTopK(docs, 10).collect()
    assert(rows.length === 10)
    val counts = rows.map(_.getAs[Long]("n_occurrences"))
    assert(counts.sameElements(counts.sortBy(-_)))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") <= r.getAs[Long]("n_occurrences"))
      assert(r.getAs[Long]("n_docs") >= 1L)
    }
  }

  test("vocabOverlap: a < b pairs only, jaccard in (0,1], sizes consistent") {
    val rows = Corpus.vocabOverlap(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("source_a"), r.getAs[String]("source_b"))
      assert(a < b)
      val common = r.getAs[Long]("n_common")
      val union = r.getAs[Long]("n_union")
      val j = r.getAs[Double]("jaccard")
      assert(common >= 1L && common <= union)
      assert(math.abs(j - common.toDouble / union) < 1e-12)
    }
    // every unordered pair appears at most once
    val pairs = rows.map(r => (r.getString(0), r.getString(1)))
    assert(pairs.distinct.length === pairs.length)
  }

  test("scrubHotWords: survivors keep order; hot set respects the cap") {
    val n = docs.count()
    val out = Corpus.scrubHotWords(docs, 0.5)
    val rows = out.collect()
    assert(rows.length === n)
    // recompute the hot set independently
    val hot = docs
      .select(explode(array_distinct(TextAnalysis.tokens(col("text")))).as("tok"))
      .groupBy("tok").count()
      .filter(col("count") >= lit(0.5) * lit(n))
      .collect().map(_.getString(0)).toSet
    val original = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val toks = original(r.getAs[Long]("doc_id")).trim.split("\\s+").toSeq
      val expected = toks.filterNot(hot)
      assert(r.getAs[Int]("n_tokens") === toks.length)
      assert(r.getAs[Int]("n_kept") === expected.length)
      // order-preserving: scrubbed IS the subsequence of survivors
      assert(r.getAs[String]("scrubbed") === expected.mkString(" "))
    }
  }

  test("scrubHotWords: cap above max df scrubs nothing") {
    val out = Corpus.scrubHotWords(docs, 1.01).collect()
    out.foreach { r =>
      assert(r.getAs[Int]("n_kept") === r.getAs[Int]("n_tokens"))
    }
  }

  test("chunkTokens: full coverage, stride-spaced starts, window-capped") {
    val (w, s) = (16, 12)
    val chunks = Corpus.chunkTokens(docs, w, s).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    val lens = docs
      .select(col("doc_id"), size(TextAnalysis.tokens(col("text"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(chunks.keySet === lens.keySet)
    chunks.foreach { case (id, cs) =>
      val n = lens(id)
      val sorted = cs.sortBy(_.getAs[Int]("chunk_idx"))
      // starts are 1, 1+s, 1+2s, ...
      sorted.zipWithIndex.foreach { case (c, i) =>
        assert(c.getAs[Int]("chunk_idx") === i)
        assert(c.getAs[Int]("start_tok") === 1 + i * s)
        assert(c.getAs[Int]("n_chunk_tokens") <= w)
        assert(c.getAs[Int]("n_chunk_tokens") >= 1)
      }
      // the last chunk ends exactly at token n — every token covered
      val last = sorted.last
      assert(last.getAs[Int]("start_tok") + last.getAs[Int]("n_chunk_tokens") - 1 === n)
      // expected chunk count
      val expect = if (n <= w) 1 else math.ceil((n - w).toDouble / s).toInt + 1
      assert(sorted.length === expect)
    }
  }

  test("vocabulary + encodeTokens: dense rank-ordered ids, lossless roundtrip") {
    val vocab = Corpus.vocabulary(docs, 5L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    // ids are dense 0..n-1 and follow (count desc, token asc)
    assert(vocab.map(_._3).sorted.toSeq === vocab.indices.toSeq)
    val byId = vocab.sortBy(_._3)
    byId.sliding(2).foreach { case Array((ta, na, _), (tb, nb, _)) =>
      assert(na > nb || (na == nb && ta < tb))
    case _ => ()
    }
    // encoding round-trips: decoding every in-vocab position through the
    // vocabulary reproduces the original token at that position
    val vmap = vocab.map(v => v._3 -> v._1).toMap
    val sample = docs.limit(20)
    val toks = sample.select(col("doc_id"),
        posexplode(TextAnalysis.tokens(col("text"))).as(Seq("p", "tok")))
      .collect().map(r => (r.getLong(0), r.getInt(1) + 1) -> r.getString(2)).toMap
    val enc = Corpus.encodeTokens(sample, Corpus.vocabulary(docs, 5L)).collect()
    assert(enc.length === toks.size) // every position encoded exactly once
    enc.foreach { r =>
      val (doc, pos, id) = (r.getLong(0), r.getInt(1), r.getInt(2))
      if (id >= 0) assert(vmap(id) === toks((doc, pos)))
      else assert(!vmap.values.toSet.contains(toks((doc, pos)))) // true OOV
    }
  }

  test("vocabulary range-partitioned ranking equals the window path") {
    // the large-vocab path (range-partition + per-partition offsets) must
    // assign the SAME dense ids as the single-partition window, including
    // on a low floor where partitions are unevenly filled
    for (minCount <- Seq(1L, 5L); parts <- Seq(3, 8)) {
      val window = Corpus.vocabulary(docs, minCount).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sortBy(_._3)
      val ranged = Corpus.vocabulary(docs, minCount, rankPartitions = parts)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sortBy(_._3)
      assert(ranged.toSeq === window.toSeq,
        s"minCount=$minCount rankPartitions=$parts")
    }
  }

  test("chunkTokens: rejects stride > window") {
    intercept[IllegalArgumentException](Corpus.chunkTokens(docs, 8, 9))
  }

  test("tfidfTopTerms: rank contract, idf monotonicity, ubiquity scores ~0") {
    import spark.implicits._
    // hand corpus: "common" in every doc (idf = ln(1) = 0 exactly),
    // "rare" in one source only, "shared" in two of three docs
    val hand = Seq(
      (1L, "common rare rare extra", "a"),
      (2L, "common shared", "b"),
      (3L, "common shared filler", "b")
    ).toDF("doc_id", "text", "source").withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
    val rows = Corpus.tfidfTopTerms(hand, 10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getInt(5)))
    // ubiquitous token scores exactly 0 micros in every source
    rows.filter(_._2 == "common").foreach(t => assert(t._5 === 0L, t))
    // rare (df=1, tf=2) outranks everything in source a
    val aTop = rows.filter(_._1 == "a").minBy(_._6)
    assert(aTop._2 === "rare" && aTop._3 === 2L && aTop._4 === 1L)
    // score arithmetic: tf_total * ln(3/df) micros, engine-exact
    rows.foreach { case (_, _, tf, df, micro, _) =>
      assert(micro === math.round(tf * math.log(3.0 / df) * 1e6))
    }
    // ranks are dense 1..n per source with score-desc, token-asc order
    rows.groupBy(_._1).foreach { case (_, g) =>
      val sorted = g.sortBy(_._6)
      assert(sorted.map(_._6).toSeq === (1 to g.length).toSeq)
      assert(sorted.toSeq === g.sortBy(t => (-t._5, t._2)).toSeq)
    }
  }

  test("tfidfTopTerms: range-partitioned ranking equals the window path") {
    for (parts <- Seq(3, 8)) {
      val window = Corpus.tfidfTopTerms(docs, 12).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getInt(5)))
        .sortBy(t => (t._1, t._6))
      val ranged = Corpus.tfidfTopTerms(docs, 12, rankPartitions = parts)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getInt(5)))
        .sortBy(t => (t._1, t._6))
      assert(ranged.toSeq === window.toSeq, s"rankPartitions=$parts")
    }
  }

  test("bigramLogProb: hand-computed Laplace model, sub-2-token docs (0,0)") {
    import spark.implicits._
    // corpus: "a b a", "a b", "x" → bigrams (a,b)x2, (b,a)x1; starts
    // a→2, b→1; vocab {a,b,x} = 3
    val hand = Seq((1L, "a b a"), (2L, "a b"), (3L, "x"))
      .toDF("doc_id", "text")
    def lp(p: Double) = math.round(math.log(p) * 1e6)
    val pAB = lp(3.0 / 5.0) // (2+1)/(2+3)
    val pBA = lp(2.0 / 4.0) // (1+1)/(1+3)
    val out = Corpus.bigramLogProb(hand).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) === ((2L, pAB + pBA)))
    assert(out(2L) === ((1L, pAB)))
    assert(out(3L) === ((0L, 0L))) // single token: no bigram, still present
    assert(out.size === 3)
  }

  test("bigramLogProb: corpus scores are negative, length-scaled, total") {
    val out = Corpus.bigramLogProb(docs).collect()
    assert(out.length === docs.count())
    out.foreach { r =>
      val (nb, s) = (r.getLong(1), r.getLong(2))
      if (nb == 0) assert(s === 0L)
      // every smoothed probability < 1, so each bigram contributes < 0
      else assert(s < 0L && s >= nb * lpFloor)
    }
  }

  /** Loosest possible per-bigram log-prob (p ≥ 1/(c1+V) ≥ 1/(2·corpus
    * tokens)): a generous floor just pinning the scale of the micros. */
  private lazy val lpFloor: Long = {
    val nTok = docs.select(explode(TextAnalysis.tokens(col("text"))))
      .count()
    math.round(math.log(1.0 / (2.0 * nTok)) * 1e6)
  }

  test("sourceDivergence: identical sources diverge 0, disjoint hit ln 2") {
    import spark.implicits._
    val ln2 = 0.6931471805599453
    def oneSided(p: Double) = math.round(p * ln2 * 500000)
    val hand = Seq(
      (1L, "a b", "s1"), (2L, "a b", "s2"), // identical distributions
      (3L, "x", "s3")) // vocabulary disjoint from both
      .toDF("doc_id", "text", "source")
    val out = Corpus.sourceDivergence(hand).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(out(("s1", "s2")) === ((2L, 0L))) // same p, q: every ln(1) term 0
    // disjoint: every token one-sided — Σ round(p·ln2·5e5) over both sides
    val disjoint = oneSided(0.5) * 2 + oneSided(1.0)
    assert(out(("s1", "s3")) === ((3L, disjoint)))
    assert(out(("s2", "s3")) === ((3L, disjoint)))
    assert(out.size === 3)
  }

  test("zipfSlope: OLS on hand counts; single-token source yields NULL") {
    import spark.implicits._
    val hand = Seq(
      (1L, "a a b a", "s1"), (2L, "a b c", "s1"), // a=4, b=2, c=1
      (3L, "x x", "s2"), (4L, "x", "s2")) // one distinct token: no fit
      .toDF("doc_id", "text", "source")
    val out = Corpus.zipfSlope(hand).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.getAs[java.lang.Double]("zipf_slope")
          ).map(_.toDouble)))).toMap
    val (xs, ys) = (Seq(1.0, 2.0, 3.0).map(math.log),
      Seq(4.0, 2.0, 1.0).map(math.log))
    val n = 3.0
    val expected = (n * xs.zip(ys).map { case (a, b) => a * b }.sum -
      xs.sum * ys.sum) / (n * xs.map(x => x * x).sum - xs.sum * xs.sum)
    val (n1, Some(got)) = out("s1")
    assert(n1 === 3L)
    assert(math.abs(got - expected) < 1e-6, s"got=$got expected=$expected")
    assert(got < 0) // frequency falls with rank
    assert(out("s2") === ((1L, None))) // degenerate fit: NULL, not 0/0
  }

  test("zipfSlope: every corpus source fits a negative finite slope") {
    val rows = Corpus.zipfSlope(docs).collect()
    assert(rows.length === docs.select("source").distinct().count())
    rows.foreach { r =>
      val s = r.getAs[Double]("zipf_slope")
      assert(!s.isNaN && !s.isInfinite && s < 0, s"slope=$s")
    }
  }

  test("sourceDivergence: a<b pairs, js in [0, ln2] micro-nats on corpus") {
    val rows = Corpus.sourceDivergence(docs).collect()
    val nSources = docs.select("source").distinct().count().toInt
    assert(rows.length === nSources * (nSources - 1) / 2)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      val js = r.getLong(3)
      // bound: Σ terms = 2·JS·5e5 ≤ ln2·1e6 (+1 for per-term rounding)
      assert(js >= 0L && js <= 693148L, s"js=$js")
    }
  }

  test("frozen-vocab encode: OOV ids are exactly the tokens absent from " +
      "the persisted vocab; ids match the vocab relation") {
    val docs = Tables.load(spark, sf, "documents")
    val vocabPath = tmpDir("graft-vocab-frozen")
    Corpus.vocabulary(docs.filter(col("doc_id") % 2 === 0), minCount = 5L)
      .write.mode("overwrite").parquet(vocabPath)
    val vocab = spark.read.parquet(vocabPath)
    val vocabMap = vocab.collect()
      .map(r => r.getAs[String]("tok") -> r.getAs[Int]("token_id")).toMap
    val enc = Corpus.encodeTokens(docs.filter(col("doc_id") % 2 =!= 0), vocab)
    // re-derive each encoded position's token driver-side and check the id
    val toks = docs.filter(col("doc_id") % 2 =!= 0)
      .select(col("doc_id"),
        graft.operators.TextAnalysis.tokens(col("text")).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val rows = enc.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tok = toks(r.getLong(0))(r.getInt(1) - 1) // pos is 1-based
      assert(r.getInt(2) === vocabMap.getOrElse(tok, -1),
        s"doc ${r.getLong(0)} pos ${r.getInt(1)} tok '$tok'")
    }
    // the split vocabulary genuinely binds: most batch-2 tokens resolve
    // (OOV presence itself is corpus-dependent — zero at this sf's tiny
    // token domain; the per-row check above pins the mapping either way,
    // and an explicit planted OOV proves the -1 path)
    assert(rows.count(_.getInt(2) >= 0) > rows.length / 2)
    import spark.implicits._
    val planted = Corpus.encodeTokens(
      Seq((999L, "zzz-never-seen-token")).toDF("doc_id", "text"), vocab)
      .collect()
    assert(planted.length === 1 && planted.head.getInt(2) === -1)
  }

  test("bm25TopK: ranking invariants and hand-computed score on a tiny corpus") {
    import spark.implicits._
    val rows = Corpus.bm25TopK(docs, Seq("spark", "hash"), 10).collect()
    assert(rows.length === 10)
    val scores = rows.map(_.getAs[Long]("bm25_1e6"))
    assert(scores.sameElements(scores.sortBy(-_)))
    assert(rows.map(_.getAs[Int]("rank")).toSeq === (1 to 10))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_terms") >= 1L && r.getAs[Long]("n_terms") <= 2L)
      assert(r.getAs[Long]("bm25_1e6") > 0L)
    }
    // hand-computed check: 3 docs, query "a"; doc 3 has no match → absent
    val tiny = Seq(
      (1L, "a a b", "s"), (2L, "a b b b", "s"), (3L, "b b", "s"))
      .toDF("doc_id", "text", "source")
    val out = Corpus.bm25TopK(tiny, Seq("a"), 10)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("bm25_1e6"))
      .toMap
    assert(!out.contains(3L))
    def bm25(tf: Long, dl: Long): Long = {
      val n = 3.0; val df = 2.0; val avgdl = 9.0 / 3.0
      val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
      math.round(idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) * 1e6)
    }
    assert(out(1L) === bm25(2L, 3L))
    assert(out(2L) === bm25(1L, 4L))
    // more occurrences in a shorter doc must strictly outrank
    assert(out(1L) > out(2L))
  }

  test("textRank: hand-computed integer iteration and stationary symmetric graph") {
    import spark.implicits._
    // a⇄b with all mass cycling: 1e9/2 each is stationary under 85/100
    // damping + teleport base (75e6 + floor(.85·5e8/1)... = 5e8 exactly)
    val sym = Seq("a b", "b a", "a b").toDF("text")
    val symOut = Corpus.textRank(sym, iters = 4).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("rank_1e9"), r.getAs[Int]("pos")))
      .toMap
    assert(symOut === Map("a" -> (500000000L, 1), "b" -> (500000000L, 2)))
    // one iteration on a→b, b→b, b→c (wout a=1, b=2), hand-traced floors
    val out1 = Corpus.textRank(Seq("a b b c").toDF("text"), iters = 1)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("rank_1e9")).toMap
    assert(out1 === Map(
      "a" -> 50000000L, "b" -> 474999999L, "c" -> 191666666L))
  }

  test("subwordSeedVocab: weighted substring counts, hand-computed tiny corpus") {
    import spark.implicits._
    // tokens: "abc" ×2 (one per doc), "bc" ×1 → 2..3-grams:
    // bc = 2(from abc)+1 = 3; ab = 2; abc = 2
    val tiny = Seq("abc bc", "abc").toDF("text")
    val out = Corpus.subwordSeedVocab(tiny, minN = 2, maxN = 3, k = 10)
      .collect().map(r => (r.getString(0), r.getAs[Long]("n_occ"),
        r.getAs[Int]("rank")))
    assert(out.toSet === Set(("bc", 3L, 1), ("ab", 2L, 2), ("abc", 2L, 3)))
    // tokens shorter than minN contribute nothing (guarded sequence)
    val short = Corpus.subwordSeedVocab(Seq("a b").toDF("text"), 2, 3, 5)
      .collect()
    assert(short.isEmpty)
  }

  test("bm25TopK and textRank reject degenerate inputs with clear messages") {
    import spark.implicits._
    // terms become column names: dots and case-collisions must fail fast
    intercept[IllegalArgumentException](
      Corpus.bm25TopK(docs, Seq("u.s"), 5))
    intercept[IllegalArgumentException](
      Corpus.bm25TopK(docs, Seq("Spark", "spark"), 5))
    // an edge-free corpus (every doc < 2 tokens) cannot seed the teleport
    intercept[IllegalArgumentException](
      Corpus.textRank(Seq("a", "b").toDF("text")))
  }

  test("textRank: corpus ranks are positive, pos is a permutation, mass bounded") {
    val rows = Corpus.textRank(docs, iters = 3).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Int]("pos")).sorted.toSeq === (1 to rows.length))
    assert(rows.forall(_.getAs[Long]("rank_1e9") > 0L))
    val mass = rows.map(_.getAs[Long]("rank_1e9")).sum
    assert(mass <= 1000000000L && mass >= 500000000L, s"mass=$mass")
  }
}
