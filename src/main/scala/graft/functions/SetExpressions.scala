package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** |A ∩ B| for two ASC-SORTED, DISTINCT, null-free ARRAY<STRING> columns,
  * as a single merge walk — no per-row hash-set allocation.
  *
  * The built-in `size(array_intersect(a, b))` builds a generic hash set per
  * row (~34 µs/row measured on ~50-element shingle arrays); exploiting the
  * sort order the dedup pipeline already guarantees (its per-doc sets come
  * from `array_sort(array_distinct(...))`) makes the verify stage of a
  * PPJoin/LSH near-dup join run at comparison speed inside whole-stage
  * codegen — the stage that touches every candidate pair, i.e. the hot
  * loop of dedup at corpus scale.
  *
  * PRECONDITION (unchecked, for speed): both arrays sorted ascending with
  * distinct non-null elements. Unsorted input returns an undercount.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_size"

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left.dataType, right.dataType).forall {
      case ArrayType(StringType, _) => true; case _ => false
    }) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<STRING> arguments, got " +
        Seq(left.dataType, right.dataType).map(_.simpleString).mkString(", "))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var acc = 0L
    while (i < nx && j < ny) {
      val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { acc += 1L; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val acc = ctx.freshName("acc")
      val c = ctx.freshName("c")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0, $j = 0;
         |long $acc = 0L;
         |while ($i < $nx && $j < $ny) {
         |  int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($c == 0) { $acc++; $i++; $j++; }
         |  else if ($c < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

/** Column-API wrapper. */
object SetCols {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  def sortedIntersectSize(a: Column, b: Column): Column =
    column(SortedIntersectSize(expression(a), expression(b)))
}
