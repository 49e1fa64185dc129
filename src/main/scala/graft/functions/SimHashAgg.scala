package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
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
  * billions of documents. The per-token hash is [[SimHashAgg.tokenHash64]]
  * (md5-derived, engine-portable) and the vote rule is strict `votes > 0`,
  * matching both the compositional explode formulation and the DuckDB
  * oracle bit-for-bit.
  */
case class SimHashAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] with UnaryLike[Expression] {

  // analysis-time type gate: without it a LONG argument passes planning
  // and every task dies with ClassCastException at runtime
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash expects a STRING argument, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buffer: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = SimHashAgg.tokenHash64(v.asInstanceOf[UTF8String])
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

  private val digest: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** Portable 64-bit token hash: the first 8 bytes of md5, big-endian —
    * the same value every engine derives from md5's leading 16 hex chars,
    * which is what lets q28's oracle recompute signatures bit-for-bit
    * (engine-seeded xxhash64 could not be cross-checked). */
  def tokenHash64(s: UTF8String): Long = {
    val d = digest.get()
    d.reset()
    val md = d.digest(s.getBytes)
    var h = 0L
    var j = 0
    while (j < 8) { h = (h << 8) | (md(j) & 0xffL); j += 1 }
    h
  }
}
