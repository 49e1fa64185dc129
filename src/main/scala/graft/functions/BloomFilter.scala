package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter sketch as a custom one-pass aggregate: hash every group
  * input (STRING or BIGINT) into an `expectedItems`/`fpp`-sized
  * [[org.apache.spark.util.sketch.BloomFilter]] (Spark's public sketch
  * API — the same filter its runtime row-level filtering uses) and emit
  * the serialized filter as BINARY.
  *
  * This is the membership analogue of [[MinHashAgg]]: partial buffers are
  * per-partition filters, merge is a bitwise OR (`mergeInPlace`), so the
  * build is one scan with map-side combine — the shape that condenses a
  * billion-key reference set into megabytes a driver can hold and every
  * task can probe row-locally. ~9.6 bits/key at fpp 1 %: 10⁶ keys ≈ 1.2 MB,
  * 10⁹ keys ≈ 1.2 GB (at that size raise fpp or pre-partition the
  * reference — the filter is a plan-shipped constant, not a broadcast).
  *
  * False positives are possible (rate `fpp`), false negatives are not —
  * callers use it as a row-local PRE-filter and restore exactness with a
  * join on the survivors (see `Dedup.bloomDecontaminateWithin`).
  */
case class BloomFilterAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] with UnaryLike[Expression] {

  require(expectedItems > 0, "expectedItems must be positive")
  require(fpp > 0.0 && fpp < 1.0, "fpp must be in (0, 1)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_agg expects a STRING or BIGINT argument, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      // UTF8String bytes directly: same key bytes the probe side hashes
      case StringType => buffer.putBinary(v.asInstanceOf[UTF8String].getBytes)
      case LongType => buffer.putLong(v.asInstanceOf[Long])
      case _ => ()
    }
    buffer
  }

  override def merge(b1: BloomFilter, b2: BloomFilter): BloomFilter =
    b1.mergeInPlace(b2)

  override def eval(buffer: BloomFilter): Any = serialize(buffer)

  override def serialize(buffer: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buffer.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomFilterAgg =
    copy(child = newChild)
}

/** mightContain(bloomBytes, value): row-local membership probe against a
  * serialized [[BloomFilterAgg]] filter. The bloom side must be FOLDABLE
  * (a literal — the collected build result): the filter deserializes once
  * per executor into an expression-held object, and codegen probes it via
  * a direct reference, so the surrounding stage stays whole-stage-compiled
  * with zero per-row deserialization.
  *
  * `true` means "possibly present" (rate-`fpp` false positives), `false`
  * means "definitely absent" — so `!mightContain` is an exact negative
  * filter, which is the scale use: discard the certain-clean bulk
  * row-locally and verify only the survivors.
  */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain expects BINARY bloom bytes, got ${left.dataType.simpleString}")
    else if (!left.foldable)
      TypeCheckResult.TypeCheckFailure(
        "bloom_might_contain expects a foldable (literal) bloom argument")
    else right.dataType match {
      case StringType | LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain expects a STRING or BIGINT probe, got ${other.simpleString}")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val bloom: BloomFilter = {
    val bytes = left.eval().asInstanceOf[Array[Byte]]
    require(bytes != null, "bloom_might_contain: bloom bytes are null")
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  private def probe(v: Any): Boolean = right.dataType match {
    case StringType => bloom.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
    case _ => bloom.mightContainLong(v.asInstanceOf[Long])
  }

  override def eval(input: InternalRow): Any = {
    val v = right.eval(input)
    if (v == null) null else probe(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the deserialized filter rides the codegen references array; the
    // foldable bloom-bytes child costs nothing per row (a literal's
    // "evaluation" is a reference), so standard null-safe codegen applies
    val bloomRef = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (_, v) => {
      val call = right.dataType match {
        case StringType => s"$bloomRef.mightContainBinary($v.getBytes())"
        case _ => s"$bloomRef.mightContainLong($v)"
      }
      s"${ev.value} = $call;"
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

/** Column-API wrappers. */
object BloomCols {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  /** bloomAgg(keyCol, n, fpp) → BINARY serialized filter. */
  def bloomAgg(c: Column, expectedItems: Long, fpp: Double): Column =
    column(BloomFilterAgg(expression(c), expectedItems, fpp).toAggregateExpression())

  /** mightContain(serializedFilterLiteral, keyCol) → BOOLEAN. */
  def mightContain(bloomBytes: Column, c: Column): Column =
    column(BloomMightContain(expression(bloomBytes), expression(c)))
}
