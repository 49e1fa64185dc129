package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Custom TypedImperativeAggregate semantics: partition-independence
  * (merge correctness), signature shape, and similarity estimation. */
class MinHashAggSpec extends SparkSpec {

  import spark.implicits._

  test("signatures are independent of partitioning (partial-merge correct)") {
    val rows = (0 until 200).map(i => (i % 4L, s"tok_$i"))
    val df1 = rows.toDF("g", "s").repartition(1)
    val df8 = rows.toDF("g", "s").repartition(8)
    def sigs(df: org.apache.spark.sql.DataFrame) =
      df.groupBy($"g").agg(MinHashAgg.minhash($"s", 16).as("sig"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(df1) === sigs(df8))
  }

  test("identical sets get identical signatures; signature length is k") {
    val df = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "c"), (2L, "a"), (2L, "b"),   // same set, different order
      (3L, "a"), (3L, "b"), (3L, "z"))
      .toDF("g", "s")
    val m = df.groupBy($"g").agg(MinHashAgg.minhash($"s", 32).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(m(1L).length === 32)
    assert(m(1L) === m(2L))
    assert(m(1L) !== m(3L))
    // 2/4 overlap: signature agreement should be partial, not total/zero
    val agree = m(1L).zip(m(3L)).count { case (a, b) => a == b }
    assert(agree > 0 && agree < 32)
  }

  test("MinHashSig matches the compositional array_min form on empty, all-null, and mixed arrays") {
    // the compositional formulation MinHashSig claims bit-parity with:
    // array_min over transform(...xxhash64-ish...) yields NULL per seed
    // when nothing hashed — the native loop must never leak MaxValue
    val df = Seq(
      (1L, Seq("a", "b", "c")),
      (2L, Seq.empty[String]),
      (3L, Seq[String](null, null)),   // all-null elements
      (4L, Seq("a", null, "c")))       // null skipped, not poisoning
      .toDF("id", "arr")
    val k = 8
    val got = df.select(col("id"),
        MinHashSig.minhashSig(col("arr"), k).as("sig"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[java.lang.Long](1))).toMap
    assert(got(1L).length === k)
    assert(got(1L).forall(_ != null))
    // empty and all-null both yield k NULLs (no sentinel leakage)
    assert(got(2L) === Seq.fill(k)(null))
    assert(got(3L) === Seq.fill(k)(null))
    assert(got(3L).forall(_ != Long.MaxValue))
    // nulls among real elements are skipped: equals the null-free set
    val clean = df.filter(col("id") === 1L)
      .select(MinHashSig.minhashSig(col("arr"), k))
      .collect().head.getSeq[java.lang.Long](0)
    val mixed = Seq((0L, Seq[String]("a", null, "b", "c", null)))
      .toDF("id", "arr")
      .select(MinHashSig.minhashSig(col("arr"), k))
      .collect().head.getSeq[java.lang.Long](0)
    assert(mixed === clean)
  }
}
