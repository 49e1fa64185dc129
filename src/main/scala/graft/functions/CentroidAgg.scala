package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Elementwise MEAN of a group's `ARRAY<FLOAT>` vectors as ONE custom
  * aggregate — the k-means "per-cell mean" step
  * ([[graft.operators.Similarity.kmeansCentroids]]) without the
  * compositional route's dim× row inflation: `posexplode` + groupBy(cell,
  * pos) + avg emits one ROW per (vector, dimension) before the partial
  * aggregate collapses it — 768× map-side rows on production embeddings,
  * pure CPU burn. Here each vector folds into a single (count, Σ per dim)
  * buffer in place: one pass, one buffer of dim+1 doubles per group,
  * map-side partial merge is an elementwise add — the
  * [[MinHashAgg]]/TopKAgg shape, which is exactly what holds at 100 TB
  * (shuffle volume nCells×(dim+1) doubles per map partition, zero row
  * expansion).
  *
  * Arithmetic parity with the exploded form it replaces (VectorSpec pins
  * it): each float widens to double and accumulates in row order; the
  * mean divides once at eval — the same `Average`-over-FloatType
  * sequence, so centroids are bit-identical. Null vectors are skipped
  * whole; a group with no usable vector evaluates to NULL (never a
  * 0-division NaN). Vectors must carry exactly `dim` non-null elements —
  * the fixed-width embedding contract everything in
  * [[graft.operators.Similarity]] already assumes; ragged rows AND null
  * elements fail loudly rather than skew a centroid (ArrayData.getFloat
  * would silently read a null element as 0.0). */
case class CentroidAgg(
    child: Expression,
    dim: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {

  require(dim > 0, "dim must be positive")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_mean expects ARRAY<FLOAT>, got ${other.simpleString}")
    }

  /** buffer(0) = vector count; buffer(1 + i) = Σ of dimension i. */
  override def createAggregationBuffer(): Array[Double] =
    new Array[Double](dim + 1)

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == dim,
        s"vec_mean(dim=$dim) got a ${arr.numElements()}-element vector")
      buffer(0) += 1
      var i = 0
      while (i < dim) {
        // getFloat on a NULL element silently reads 0.0 — which would
        // skew the mean while still counting the vector; a null element
        // violates the fixed-width contract, so fail loudly instead
        require(!arr.isNullAt(i),
          s"vec_mean: NULL element at position $i — embeddings must be " +
            "null-free")
        buffer(i + 1) += arr.getFloat(i)
        i += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    var i = 0
    while (i <= dim) {
      b1(i) += b2(i)
      i += 1
    }
    b1
  }

  override def eval(buffer: Array[Double]): Any =
    if (buffer(0) == 0) null
    else {
      val n = buffer(0)
      val out = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        out(i) = buffer(i + 1) / n
        i += 1
      }
      ArrayData.toArrayData(out)
    }

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * (dim + 1))
    buffer.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(dim + 1)(bb.getDouble())
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_mean"

  override def withNewMutableAggBufferOffset(newOffset: Int): CentroidAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CentroidAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CentroidAgg =
    copy(child = newChild)
}

object CentroidAgg {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  /** Column API: vec_mean(ARRAY<FLOAT> col, dim) → ARRAY<DOUBLE> mean. */
  def vecMean(c: Column, dim: Int): Column =
    column(CentroidAgg(expression(c), dim).toAggregateExpression())
}
