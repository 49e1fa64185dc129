package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Top-k ids by score as ONE aggregate: keeps the k (score, id) pairs with
  * the highest score — ties broken by the smaller id, so the result is
  * deterministic under any partitioning — and returns the ids in rank
  * order.
  *
  * This is the aggregation shape a brute-force kNN JOIN needs at scale:
  * grouping a (corpus × queries) score relation by query with a window
  * ranker would shuffle every scored row into as few partitions as there
  * are queries (extreme skew), whereas a TypedImperativeAggregate keeps a
  * k-element buffer per group on the MAP side — the shuffle carries only
  * partitions × queries × k rows and the hot work (score + heap insert)
  * stays embarrassingly parallel.
  *
  * Buffers hold two parallel k-arrays kept sorted best-first; k is
  * expected small (neighbors, not percentiles), so insertion is a linear
  * walk and merge is a two-pointer pass.
  */
case class TopKAgg(
    left: Expression,  // score: DOUBLE
    right: Expression, // id: BIGINT
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Buffer] with BinaryLike[Expression] {

  require(k > 0, "k must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"topk expects a DOUBLE score, got ${left.dataType.simpleString}")
    else if (right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"topk expects a BIGINT id, got ${right.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): TopKAgg.Buffer =
    new TopKAgg.Buffer(new Array[Double](k), new Array[Long](k), 0)

  override def update(b: TopKAgg.Buffer, input: InternalRow): TopKAgg.Buffer = {
    val s = left.eval(input)
    val i = right.eval(input)
    // NaN is excluded at the gate: beats() is false for every comparison
    // involving NaN, so a NaN admitted while size < k would sit in the
    // buffer violating the sort invariant and, once last, block all later
    // inserts. Treating NaN like NULL (no rank) keeps the invariant total.
    if (s != null && i != null && !s.asInstanceOf[Double].isNaN)
      b.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    b
  }

  override def merge(b1: TopKAgg.Buffer, b2: TopKAgg.Buffer): TopKAgg.Buffer = {
    var i = 0
    while (i < b2.size) { b1.insert(b2.scores(i), b2.ids(i)); i += 1 }
    b1
  }

  override def eval(b: TopKAgg.Buffer): Any =
    ArrayData.toArrayData(java.util.Arrays.copyOf(b.ids, b.size))

  override def serialize(b: TopKAgg.Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * b.size)
    bb.putInt(b.size)
    var i = 0
    while (i < b.size) { bb.putDouble(b.scores(i)); bb.putLong(b.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val b = createAggregationBuffer()
    var i = 0
    while (i < n) { b.insert(bb.getDouble(), bb.getLong()); i += 1 }
    b
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKAgg =
    copy(left = newLeft, right = newRight)
}

object TopKAgg {

  /** Parallel arrays sorted best-first by (score desc, id asc); `size` ≤ k
    * entries are live. */
  final class Buffer(val scores: Array[Double], val ids: Array[Long], var size: Int) {
    private def beats(s: Double, id: Long, pos: Int): Boolean =
      s > scores(pos) || (s == scores(pos) && id < ids(pos))

    def insert(s: Double, id: Long): Unit = {
      val k = scores.length
      if (size == k && !beats(s, id, k - 1)) return
      // walk up from the insertion end, shifting worse entries down
      var pos = math.min(size, k - 1)
      while (pos > 0 && beats(s, id, pos - 1)) {
        scores(pos) = scores(pos - 1); ids(pos) = ids(pos - 1)
        pos -= 1
      }
      scores(pos) = s; ids(pos) = id
      if (size < k) size += 1
    }
  }

  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  /** Column API: topk(score, id, k) → ARRAY<BIGINT> of the ids of the k
    * highest scores, rank-ordered, smaller id winning score ties. */
  def topk(score: Column, id: Column, k: Int): Column =
    column(TopKAgg(expression(score), expression(id), k).toAggregateExpression())
}
