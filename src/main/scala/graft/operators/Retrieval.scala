package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Multi-retriever result fusion for hybrid search — the step that merges
  * a lexical (BM25) ranking with a vector (ANN/cosine) ranking into one
  * list, as production retrieval stacks do for RAG-style corpus serving.
  *
  * Reciprocal Rank Fusion (Cormack et al., SIGIR'09): each retriever
  * contributes 1/(k0 + rank) for every item on its top-k list, and items
  * are re-ranked by the summed contribution. RRF is used here not just
  * because it's the industry default (Elasticsearch, Vespa, OpenSearch all
  * ship it) but because it is EXACT by construction: ranks are integers,
  * so each contribution is one double division quantized to integer
  * micros, and the fused score is an integer sum — order-independent,
  * cross-engine bit-stable, no score normalization to drift.
  *
  * Scale shape: the inputs are already-pruned top-k lists (tiny by
  * contract — the upstream retrievers did the heavy lifting with their own
  * scale-safe plans), so fusion is a unionByName + one hash aggregate on
  * the item id; per-retriever ranks surface as conditional-min columns,
  * avoiding an N-way outer join. Final ranking is orderBy+limit
  * (TakeOrderedAndProject) with the k-row window ranking only survivors.
  */
object Retrieval {

  /** Fuse named top-k rankings, each a DataFrame with columns
    * (`id`: long, `rank`: int, 1-based). Returns one row per item seen on
    * any list: (id, rank_<name>… nullable, rrf_1e6, rank), top `k` by
    * fused score (ties on id). */
  def rrfFuse(lists: Seq[(String, DataFrame)], k: Int, k0: Int = 60): DataFrame = {
    require(lists.nonEmpty, "need at least one ranking")
    require(lists.map(_._1).distinct.size == lists.size, "duplicate list names")
    require(k > 0 && k0 >= 0, s"k=$k k0=$k0")
    // Normalize each list to at most ONE row per id (best = min rank)
    // before the union: a list carrying an id twice would otherwise
    // contribute 1/(k0+rank) once per duplicate row to the fused sum
    // while rank_<name> showed only the min — silently double-counted
    // scores. The lists are contractually tiny top-k relations, so the
    // per-list dedup aggregate is free.
    val tagged = lists.map { case (name, df) =>
      df.select(col("id").cast(LongType).as("id"),
        col("rank").cast(IntegerType).as("rank"))
        .groupBy(col("id")).agg(min(col("rank")).as("rank"))
        .withColumn("src", lit(name))
    }.reduce(_ unionByName _)
    val rankCols = lists.map { case (name, _) =>
      min(when(col("src") === name, col("rank"))).as(s"rank_$name")
    }
    val aggs = rankCols :+
      sum(round(lit(1e6) / (lit(k0) + col("rank"))).cast(LongType))
        .as("rrf_1e6")
    val fused = tagged.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
    val ord = Seq(col("rrf_1e6").desc, col("id").asc)
    fused.orderBy(ord: _*).limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(ord: _*)).cast(IntegerType))
  }
}
