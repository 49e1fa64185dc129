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
import org.apache.spark.util.sketch.CountMinSketch

/** Count-Min frequency sketch as a one-pass mergeable aggregate
  * (Cormode–Muthukrishnan): d=⌈ln(1/δ)⌉ hash rows × w=⌈e/ε⌉ counters,
  * updated per input, merged per-cell — map-side partial aggregation
  * works, so a 100 TB token stream condenses into a fixed
  * `d × w × 8`-byte grid regardless of key cardinality. Serialized
  * sketch (BINARY) out; probe with [[CountMinEstimate]].
  *
  * Estimate guarantees (the contract q92 hash-checks): never BELOW the
  * true count, and within ε·N above it with probability ≥ confidence.
  * This completes the mergeable-sketch family next to HLL
  * (approx_count_distinct), [[BloomFilterAgg]] (membership),
  * [[MinHashAgg]]/[[SimHashAgg]] (similarity) and [[TopKAgg]] (exact
  * bounded top-k): CMS answers "how often does key X occur" when the key
  * space is too large to count exactly per key.
  */
case class CountMinAgg(
    child: Expression,
    eps: Double,
    confidence: Double,
    seed: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinSketch] with UnaryLike[Expression] {

  require(eps > 0.0 && eps < 1.0, "eps must be in (0, 1)")
  require(confidence > 0.0 && confidence < 1.0, "confidence must be in (0, 1)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"count_min_agg expects a STRING or BIGINT argument, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): CountMinSketch =
    CountMinSketch.create(eps, confidence, seed)

  override def update(buffer: CountMinSketch, input: InternalRow): CountMinSketch = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      // raw UTF-8 bytes: the same key bytes CountMinEstimate probes
      case StringType => buffer.addBinary(v.asInstanceOf[UTF8String].getBytes)
      case LongType => buffer.addLong(v.asInstanceOf[Long])
      case _ => ()
    }
    buffer
  }

  override def merge(b1: CountMinSketch, b2: CountMinSketch): CountMinSketch =
    b1.mergeInPlace(b2)

  override def eval(buffer: CountMinSketch): Any = serialize(buffer)

  override def serialize(buffer: CountMinSketch): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buffer.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "count_min_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinAgg =
    copy(child = newChild)
}

/** estimate(cmsBytes, key) → BIGINT estimated occurrence count. The
  * sketch side must be foldable (the collected build result); it
  * deserializes once per executor and codegen probes it directly —
  * same pattern as [[BloomMightContain]]. */
case class CountMinEstimate(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"count_min_estimate expects BINARY sketch bytes, got ${left.dataType.simpleString}")
    else if (!left.foldable)
      TypeCheckResult.TypeCheckFailure(
        "count_min_estimate expects a foldable (literal) sketch argument")
    else right.dataType match {
      case StringType | LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"count_min_estimate expects a STRING or BIGINT probe, got ${other.simpleString}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "count_min_estimate"

  @transient private lazy val sketch: CountMinSketch = {
    val bytes = left.eval().asInstanceOf[Array[Byte]]
    require(bytes != null, "count_min_estimate: sketch bytes are null")
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
  }

  override def eval(input: InternalRow): Any = {
    val v = right.eval(input)
    if (v == null) null
    else right.dataType match {
      case StringType => sketch.estimateCount(v.asInstanceOf[UTF8String].getBytes)
      case _ => sketch.estimateCount(v.asInstanceOf[Long])
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cms", sketch, classOf[CountMinSketch].getName)
    nullSafeCodeGen(ctx, ev, (_, v) => {
      val call = right.dataType match {
        case StringType => s"$ref.estimateCount($v.getBytes())"
        case _ => s"$ref.estimateCount((Object) (Long) $v)"
      }
      s"${ev.value} = $call;"
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountMinEstimate =
    copy(left = newLeft, right = newRight)
}

/** Column-API wrappers. */
object CountMinCols {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  def countMinAgg(c: Column, eps: Double, confidence: Double, seed: Int): Column =
    column(CountMinAgg(expression(c), eps, confidence, seed).toAggregateExpression())

  def estimate(sketchBytes: Column, c: Column): Column =
    column(CountMinEstimate(expression(sketchBytes), expression(c)))
}
