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

/** text → ASC-SORTED DISTINCT 3-gram shingle array, in ONE compiled pass —
  * the native form of the dedup pipeline's
  * `array_sort(array_distinct(shingles3(tokens(text))))` chain.
  *
  * The compositional chain is four stacked higher-order functions, every
  * one evaluated by interpreted lambdas (`transform` with 3 element_at
  * derefs per shingle, `array_distinct`, `array_sort` with a per-compare
  * lambda) — measured ~3.5 s just to shingle 2 500 docs at sf0.1, which
  * made per-micro-batch shingling THE cost of the streaming dedup gate
  * (q127), where nothing can be persisted between arrivals. This
  * expression does the same work in plain Java: regex split, string
  * concat, TreeSet dedup+sort — and leaves the row inside whole-stage
  * codegen via a bound method call.
  *
  * Semantics pinned to the chain it replaces (TextSpec asserts equality):
  * trim is Spark's space-only `StringTrim`; the split is the same Java
  * regex `\s+` with limit −1 that `split()` delegates to (a leading
  * tab/newline still yields the leading empty token); fewer than 3 tokens
  * → empty array; shingles are space-joined token triples; ordering is
  * UTF8String BINARY order (NOT Java String UTF-16 order — they differ
  * off the BMP), exactly `array_sort`'s. */
case class SortedShingles3(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "sorted_shingles3"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.simpleString}")

  def compute(s: Any): ArrayData = {
    import org.apache.spark.unsafe.types.UTF8String
    val toks = SortedShingles3.Whitespace
      .split(s.asInstanceOf[UTF8String].trim().toString, -1)
    if (toks.length < 3)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    val set = new java.util.TreeSet[UTF8String]()
    var i = 0
    while (i <= toks.length - 3) {
      set.add(UTF8String.fromString(
        toks(i) + " " + toks(i + 1) + " " + toks(i + 2)))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      set.toArray(new Array[AnyRef](set.size)))
  }

  override def nullSafeEval(s: Any): Any = compute(s)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val ref = ctx.addReferenceObj("sortedShingles3", this,
        classOf[SortedShingles3].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$ref.compute($s);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): SortedShingles3 = copy(child = newChild)
}

object SortedShingles3 {
  /** The exact pattern `tokens()`'s split uses. */
  private[functions] val Whitespace = java.util.regex.Pattern.compile("\\s+")
}

/** Column-API wrapper. */
object SetCols {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  def sortedIntersectSize(a: Column, b: Column): Column =
    column(SortedIntersectSize(expression(a), expression(b)))

  def sortedShingles3(text: Column): Column =
    column(SortedShingles3(expression(text)))
}
