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

/** bit_interleave_n(x1, …, xn, bits): the N-dimensional Morton code —
  * bit i of dimension j lands at position n·i + j for the low `bits`
  * bits of each dimension (for n = 2 the layout is bit-identical to
  * [[BitInterleave]]). Sorting by the code clusters ALL n dimensions
  * at once, the n-column `OPTIMIZE ZORDER BY` layout: every rewritten
  * file covers a small n-cube of the key space, so conjunctive
  * min/max skipping stays selective on every axis after maintenance.
  * `n · bits` must fit a long's sign-free 63 bits. Native codegen
  * (unrolled per-dimension shift/mask loops, no allocation). */
case class BitInterleaveN(children: Seq[Expression], bits: Int)
  extends Expression {

  private val n = children.size
  require(n >= 2, "bit_interleave_n needs at least two dimensions")
  require(bits > 0 && n * bits <= 63,
    s"n*bits must fit 63 bits, got $n dimensions x $bits bits")

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(e =>
      e.dataType == LongType || e.dataType == IntegerType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bit_interleave_n expects INT/BIGINT dimensions, got " +
        children.map(_.dataType.simpleString).mkString(", "))

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "bit_interleave_n"

  override def eval(
      input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    var z = 0L
    var j = 0
    while (j < n) {
      val v = children(j).eval(input)
      if (v == null) return null
      val x = v.asInstanceOf[Number].longValue()
      var i = 0
      while (i < bits) {
        z |= ((x >> i) & 1L) << (n * i + j)
        i += 1
      }
      j += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val evals = children.map(_.genCode(ctx))
    val z = ctx.freshName("z")
    val loops = evals.zipWithIndex.map { case (e, j) =>
      val i = ctx.freshName("i")
      s"""for (int $i = 0; $i < $bits; $i++) {
         |  $z |= ((((long) ${e.value}) >> $i) & 1L) << ($n * $i + $j);
         |}""".stripMargin
    }.mkString("\n")
    val childCode = evals.map(_.code.toString).mkString("\n")
    if (nullable) {
      val anyNull = evals.map(_.isNull.toString).mkString(" || ")
      ev.copy(code =
        code"""
          $childCode
          boolean ${ev.isNull} = $anyNull;
          long ${ev.value} = 0L;
          if (!${ev.isNull}) {
            long $z = 0L;
            $loops
            ${ev.value} = $z;
          }""")
    } else {
      ev.copy(code =
        code"""
          $childCode
          long $z = 0L;
          $loops
          long ${ev.value} = $z;""", isNull = FalseLiteral)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitInterleaveN =
    copy(children = newChildren)
}

/** Column-API wrapper. */
object LayoutCols {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  def bitInterleave(x: Column, y: Column, bits: Int): Column =
    column(BitInterleave(expression(x), expression(y), bits))

  def bitInterleaveN(cols: Seq[Column], bits: Int): Column =
    column(BitInterleaveN(cols.map(expression), bits))
}
