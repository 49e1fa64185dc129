package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as a single custom aggregate: for each of `numHashes`
  * seeds, the minimum xxhash64(seed, value) over the group's input strings
  * (Broder's min-wise permutation estimate of set similarity).
  *
  * Versus the compositional route (explode one row per (element, seed) and
  * groupBy-min), this computes all k minima in ONE pass over the shingle
  * rows: no k× row expansion through the pipeline, one aggregation buffer
  * of k longs per group, and map-side partial merge is an elementwise min —
  * exactly the shape that scales to billions of documents.
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(numHashes > 0, "numHashes must be positive")

  // analysis-time type gate: without it a LONG argument passes planning
  // and every task dies with ClassCastException at runtime
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"minhash expects a STRING argument, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      var i = 0
      while (i < numHashes) {
        val h = XxHash64Function.hash(s, StringType, i.toLong)
        if (h < buffer(i)) buffer(i) = h
        i += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (b2(i) < b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buffer: Array[Long]): Any = ArrayData.toArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numHashes)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
}

object MinHashAgg {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  /** Column API: minhash(stringCol, k) → ARRAY<BIGINT> of k minima. */
  def minhash(c: Column, k: Int): Column =
    column(MinHashAgg(expression(c), k).toAggregateExpression())
}

/** ROW-LOCAL MinHash signature over an ARRAY<STRING>: all `numHashes`
  * minima in ONE pass over the array — the scalar twin of [[MinHashAgg]],
  * same `XxHash64Function.hash(s, seed = i)` arithmetic, so signatures
  * are bit-identical to both the aggregate path and the compositional
  * `array_min(transform(...))` formulation it replaces (DedupSpec asserts
  * the agg parity). The compositional form evaluates k interpreted
  * higher-order lambdas per row — k array allocations and k passes; on
  * the streaming dedup gate (q127), where every arriving doc signs
  * itself, that interpreted k× loop WAS the row cost. Here the hash loop
  * runs inside whole-stage codegen via a bound method call.
  *
  * Null elements are skipped (the [[MinHashAgg]] convention; the dedup
  * pipeline's arrays are null-free by construction). An EMPTY array —
  * or one whose elements are ALL null, so no hash was ever computed —
  * yields k NULL minima: exactly what `array_min` over an empty (or
  * all-null) transform produces, keeping the claimed bit-parity with
  * the compositional form on every input, not just null-free ones, and
  * never leaking Long.MaxValue sentinels as real minima. */
case class MinHashSig(child: Expression, numHashes: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(numHashes > 0, "numHashes must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects ARRAY<STRING>, got ${other.simpleString}")
    }

  /** Shared by eval and codegen: one pass, k running minima. */
  def compute(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var seen = false // any non-null element hashed?
    var i = 0
    while (i < n) {
      val s = a.getUTF8String(i)
      if (s != null) {
        seen = true
        var k = 0
        while (k < numHashes) {
          val h = XxHash64Function.hash(s, StringType, k.toLong)
          if (h < mins(k)) mins(k) = h
          k += 1
        }
      }
      i += 1
    }
    if (!seen) // empty OR all-null: k NULLs, never MaxValue sentinels
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        new Array[Any](numHashes))
    else ArrayData.toArrayData(mins)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("minhashSig", this,
        classOf[MinHashSig].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$ref.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  /** Column API: minhash_sig(arrayCol, k) → ARRAY<BIGINT> of k minima. */
  def minhashSig(c: Column, k: Int): Column =
    column(MinHashSig(expression(c), k))
}
