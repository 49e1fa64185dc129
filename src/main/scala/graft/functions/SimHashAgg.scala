package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash (Charikar) as a single custom aggregate: each input
  * string hashes to 64 bits, every bit votes +1/-1, and the signature bit
  * is 1 iff the group's vote sum is positive.
  *
  * Versus the compositional route (explode 64 rows per token and
  * groupBy-sum), this computes the whole signature in ONE pass: no 64× row
  * expansion before the shuffle, one 64-int vote buffer per group, and
  * map-side partial merge is an elementwise add — the shape that scales to
  * billions of documents. Hash and vote rule match the compositional
  * `xxhash64(tok)` formulation exactly (seed 42, strict `votes > 0`), so
  * both produce identical signatures.
  */
case class SimHashAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buffer: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      // Spark's xxhash64(col) default seed, so signatures are comparable
      // with hashes computed via the SQL function.
      val h = XxHash64Function.hash(v.asInstanceOf[UTF8String], StringType, 42L)
      var i = 0
      while (i < 64) {
        buffer(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
        i += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Int]): Any = {
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (buffer(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  override def serialize(buffer: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * 64)
    buffer.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getInt())
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SimHashAgg =
    copy(child = newChild)
}

object SimHashAgg {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  /** Column API: simhash(stringCol) → BIGINT signature. */
  def simhash(c: Column): Column =
    column(SimHashAgg(expression(c)).toAggregateExpression())
}
