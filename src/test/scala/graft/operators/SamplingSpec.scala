package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Deterministic hash sampling/splits: threshold encoding, md5 key parity
  * with the oracle engine, stability, and split partitioning. */
class SamplingSpec extends SparkSpec {

  test("hexThreshold encodes fractions as 8 hex digits; boundaries exact") {
    assert(Sampling.hexThreshold(0.25) === "40000000")
    assert(Sampling.hexThreshold(0.5) === "80000000")
    assert(Sampling.hexThreshold(0.0) === "00000000")
    assert(Sampling.hexThreshold(1.0) === "g") // above every hex digest
    intercept[IllegalArgumentException](Sampling.hexThreshold(1.5))
  }

  test("hashKey is the standard lowercase-hex md5 of the UTF-8 bytes") {
    import spark.implicits._
    val got = Seq("hello").toDF("text")
      .select(Sampling.hashKey(col("text"))).head().getString(0)
    // known md5("hello") — the value DuckDB's md5() also produces, which
    // is what makes the sampling decision engine-portable
    assert(got === "5d41402abc4b2a76b9719d911017c592")
  }

  test("hashSample: deterministic, approximately the asked fraction") {
    val docs = Tables.load(spark, sf, "documents")
    val n = docs.count().toDouble
    val s1 = Sampling.hashSample(docs, col("text"), 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s2 = Sampling.hashSample(docs, col("text"), 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 === s2) // bit-stable across runs
    assert(math.abs(s1.size / n - 0.25) < 0.15) // uniform-ish at small n
    // monotone: a bigger fraction strictly contains a smaller one
    val s3 = Sampling.hashSample(docs, col("text"), 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1.subsetOf(s3))
  }

  test("splitAssign partitions every row into exactly one named split") {
    val docs = Tables.load(spark, sf, "documents")
    val cuts = Seq("train" -> 0.8, "val" -> 0.9, "test" -> 1.0)
    val counts = docs
      .groupBy(Sampling.splitAssign(col("text"), cuts).as("split"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    assert(counts.values.sum === docs.count())
    assert(counts("train") > counts.getOrElse("val", 0L))
  }

  test("mixFractions: scarcest source binds, fractions cap at 1.0, missing source rejected") {
    val counts = Map("a" -> 100L, "b" -> 50L, "c" -> 400L)
    val f = Sampling.mixFractions(counts, Map("a" -> 0.5, "b" -> 0.25, "c" -> 0.25))
    // binding source: min(100/0.5, 50/0.25, 400/0.25) = 200 ⇒ a keeps all
    assert(f("a") === 1.0)
    assert(f("b") === 1.0)
    assert(math.abs(f("c") - 200.0 * 0.25 / 400) < 1e-12)
    intercept[IllegalArgumentException] {
      Sampling.mixFractions(counts, Map("a" -> 0.5, "zzz" -> 0.5))
    }
    intercept[IllegalArgumentException] {
      Sampling.mixFractions(counts, Map("a" -> 0.0))
    }
  }

  test("mixToWeights: unlisted sources dropped, kept shares track the weights") {
    val docs = Tables.load(spark, sf, "documents")
    val w = Map("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2, "src3" -> 0.1)
    val out = Sampling.mixToWeights(docs, col("source"), col("text"), w)
    val bySrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc.keySet.subsetOf(w.keySet)) // unlisted sources never survive
    // deterministic under re-run
    val again = Sampling.mixToWeights(docs, col("source"), col("text"), w)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again === bySrc)
    // the binding source (largest weight here, equal counts) keeps everything
    val srcTotals = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("src0") === srcTotals("src0"))
    // monotone in weight: heavier-weighted sources keep at least as many
    assert(bySrc("src0") >= bySrc("src1") && bySrc("src1") >= bySrc("src2") &&
      bySrc("src2") >= bySrc("src3"))
  }

  test("stratifiedSample: exact quota, window-rank parity, partition-stable") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, sf, "documents")
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.stratifiedSample(df, col("lang"), col("doc_id"), col("text"), 7)
        .collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val got = run(docs)
    // quota exact per stratum (corpus has >7 docs per lang), ranks 1..7
    got.groupBy(_._1).foreach { case (lang, rows) =>
      assert(rows.size === 7, lang)
      assert(rows.map(_._2) === (1 to 7).toSet, lang)
    }
    // the aggregate must equal the straightforward window formulation
    val ref = docs.select(col("lang"), col("doc_id"),
        row_number().over(Window.partitionBy(col("lang"))
          .orderBy(Sampling.orderKey53(col("text")), col("doc_id"))).as("rk"))
      .filter(col("rk") <= 7)
      .collect().map(r => (r.getString(0), r.getInt(2), r.getLong(1))).toSet
    assert(got === ref)
    // partitioning must not change the sample (map-side buffers merge)
    assert(run(docs.repartition(13)) === got)
  }

  test("weightedSample: weight dominates selection, same-content ties order by weight") {
    import spark.implicits._
    val rows = (1L to 10L).map(i => (i, s"doc-$i", "s", 1L)) :+
      (99L, "heavy", "s", 1000000000000L) // w=1e12 → key ≈ 0 → rank 1
    val df = rows.toDF("doc_id", "text", "source", "w")
    val out = Sampling.weightedSample(df, col("source"), col("doc_id"),
        col("text"), col("w"), n = 5)
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(out.size === 5)
    assert(out(1) === 99L)
    // identical text (same u), different weights: higher weight must
    // rank strictly earlier (−ln(u)/w shrinks with w)
    val dup = Seq((1L, "same", "s", 1L), (2L, "same", "s", 100L))
      .toDF("doc_id", "text", "source", "w")
    val dupOut = Sampling.weightedSample(dup, col("source"), col("doc_id"),
        col("text"), col("w"), n = 2)
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(dupOut === Map(1 -> 2L, 2 -> 1L))
    // zero/negative weights are excluded, not sampled
    val z = Seq((1L, "a", "s", 0L), (2L, "b", "s", 3L))
      .toDF("doc_id", "text", "source", "w")
    val zOut = Sampling.weightedSample(z, col("source"), col("doc_id"),
        col("text"), col("w"), n = 5).collect()
    assert(zOut.map(_.getLong(2)).toSeq === Seq(2L))
  }
}
