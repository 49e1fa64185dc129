package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Corpus-layout invariants: sharding is a permutation, packing fills
  * contiguous token-budget blocks, everything reproducible. */
class PackingSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sf, "documents")

  test("shardAssign: a permutation into [0, nShards) with contiguous positions") {
    val s = Packing.shardAssign(docs, nShards = 8, seed = 7L).collect()
    assert(s.length === docs.count())
    assert(s.map(_.getAs[Long]("doc_id")).distinct.length === s.length)
    assert(s.forall(r => (0 until 8).contains(r.getAs[Int]("shard"))))
    // positions are exactly 1..n within every shard
    s.groupBy(_.getAs[Int]("shard")).values.foreach { rs =>
      assert(rs.map(_.getAs[Int]("pos")).sorted.toSeq === (1 to rs.length))
    }
    // the within-shard order is a real pseudo-shuffle, not corpus order
    val shard0ByPos = s.filter(_.getAs[Int]("shard") === 0)
      .sortBy(_.getAs[Int]("pos")).map(_.getAs[Long]("doc_id")).toSeq
    assert(shard0ByPos !== shard0ByPos.sorted)
    // deterministic: a second run is identical
    val again = Packing.shardAssign(docs, nShards = 8, seed = 7L).collect()
    assert(again.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet ===
      s.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet)
  }

  test("packSequences: bins are contiguous budget-crossing blocks") {
    val budget = 64
    val p = Packing.packSequences(docs, nShards = 8, seed = 7L,
      tokenBudget = budget).collect()
    p.groupBy(_.getAs[Int]("shard")).values.foreach { rs =>
      val byPos = rs.sortBy(_.getAs[Int]("pos"))
      var cum = 0L
      var prevBin = 0
      byPos.foreach { r =>
        cum += r.getAs[Long]("n_tokens")
        val bin = r.getAs[Int]("bin")
        // bin is exactly the ceil(cum/budget) contract (min 1)
        assert(bin === math.max(1, math.ceil(cum.toDouble / budget).toInt))
        // bins never go backwards and never skip
        assert(bin >= prevBin && bin <= prevBin + math.max(1,
          (r.getAs[Long]("n_tokens") / budget + 1).toInt))
        prevBin = bin
      }
    }
    // every doc appears exactly once with its true token count
    assert(p.map(_.getAs[Long]("doc_id")).distinct.length === docs.count())
    val nTokens = docs.select(col("doc_id"),
      size(TextAnalysis.tokens(col("text"))).cast("long").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    p.foreach(r =>
      assert(r.getAs[Long]("n_tokens") === nTokens(r.getAs[Long]("doc_id"))))
  }
}
