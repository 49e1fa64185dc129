package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._

/** bit_interleave(x, y, bits): the Morton (Z-order) code of two BIGINT
  * dimension values — bit i of `x` lands at position 2i, bit i of `y` at
  * 2i+1, for the low `bits` bits of each. Sorting by this single value
  * clusters BOTH dimensions at once (each additional significant bit
  * halves the space alternately in x and y), which is what makes
  * multi-dimensional file pruning work: a range scan on either dimension
  * touches O(√files) of a Z-ordered layout instead of all of them.
  *
  * Native codegen expression (tight shift/mask loop, no allocation) —
  * the Z-value computation sits in the write path of every layout job,
  * directly on the scan, so it must not break whole-stage codegen.
  */
case class BitInterleave(left: Expression, right: Expression, bits: Int)
  extends BinaryExpression {

  require(bits > 0 && bits <= 31, "bits must be in [1, 31]")

  // INT accepted alongside BIGINT (SQL integer literals arrive as INT);
  // both widen losslessly to the long bit arithmetic
  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(e =>
      e.dataType == LongType || e.dataType == IntegerType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bit_interleave expects INT/BIGINT dimensions, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "bit_interleave"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Number].longValue()
    val y = b.asInstanceOf[Number].longValue()
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val z = ctx.freshName("z")
      s"""
         |long $z = 0L;
         |for (int $i = 0; $i < $bits; $i++) {
         |  $z |= ((((long) $a) >> $i) & 1L) << (2 * $i);
         |  $z |= ((((long) $b) >> $i) & 1L) << (2 * $i + 1);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitInterleave =
    copy(left = newLeft, right = newRight)
}

/** Column-API wrapper. */
object LayoutCols {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  def bitInterleave(x: Column, y: Column, bits: Int): Column =
    column(BitInterleave(expression(x), expression(y), bits))
}
