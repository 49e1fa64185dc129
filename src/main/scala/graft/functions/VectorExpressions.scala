package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding math over
  * `ArrayType(FloatType)` columns.
  *
  * The built-in route (`zip_with` + `aggregate`) is a higher-order
  * function: interpreted per element with lambda-variable binding, and it
  * breaks whole-stage codegen. These expressions generate a tight primitive
  * loop (`doGenCode`) — one pass, no allocation — and keep the surrounding
  * stage fully codegen'd, which is the difference between scanning 100 TB
  * of embeddings at memory bandwidth vs. interpreter speed.
  */
trait FloatVecExpression { self: Expression =>
  override def dataType: DataType = DoubleType

  protected def checkFloatArrays(inputs: Seq[DataType]): TypeCheckResult =
    if (inputs.forall { case ArrayType(FloatType, _) => true; case _ => false })
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<FLOAT> arguments, got " +
        inputs.map(_.simpleString).mkString(", "))
}

/** dot(a, b): Σ a_i·b_i in double precision (sequential, deterministic).
  * Mismatched vector lengths yield NULL — a truncated similarity over the
  * shared prefix would be a plausible-looking wrong answer that could rank
  * a corrupt embedding into top-k results undetected. */
case class FloatVecDot(left: Expression, right: Expression)
  extends BinaryExpression with FloatVecExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    checkFloatArrays(Seq(left.dataType, right.dataType))
  override def prettyName: String = "vec_dot"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (double)$a.getFloat($i) * (double)$b.getFloat($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

/** cosine(a, b): dot / (‖a‖·‖b‖) in one pass; 0.0 when either norm is 0;
  * NULL on mismatched vector lengths (see [[FloatVecDot]]). */
case class FloatVecCosine(left: Expression, right: Expression)
  extends BinaryExpression with FloatVecExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    checkFloatArrays(Seq(left.dataType, right.dataType))
  override def prettyName: String = "vec_cosine"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv
      na += xv * xv
      nb += yv * yv
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xv = (double)$a.getFloat($i);
         |    double $yv = (double)$b.getFloat($i);
         |    $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |  }
         |  ${ev.value} = ($na == 0.0 || $nb == 0.0)
         |    ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecCosine =
    copy(left = newLeft, right = newRight)
}

/** ‖a‖: L2 norm in double precision. */
case class FloatVecNorm(child: Expression)
  extends UnaryExpression with FloatVecExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    checkFloatArrays(Seq(child.dataType))
  override def prettyName: String = "vec_norm"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      val v = x.getFloat(i).toDouble
      acc += v * v
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = (double)$a.getFloat($i);
         |  $acc += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FloatVecNorm =
    copy(child = newChild)
}

/** Column-API wrappers over the native expressions. */
object VecCols {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  def dot(a: Column, b: Column): Column =
    column(FloatVecDot(expression(a), expression(b)))
  def cosine(a: Column, b: Column): Column =
    column(FloatVecCosine(expression(a), expression(b)))
  def norm(a: Column): Column = column(FloatVecNorm(expression(a)))
}

/** Session registration so the expressions are usable from both the Column
  * API (`call_function`) and plain SQL. The builder list is the single
  * source for BOTH deployment paths: `register` installs them imperatively
  * on an existing session ([[graft.GraftSession.prepare]]), and
  * [[graft.GraftExtensions]] injects the same list at session build time
  * via `spark.sql.extensions`. */
object GraftFunctions {

  private def intLit(args: Seq[Expression], i: Int, usage: String): Int = {
    // foldable gate BEFORE eval(): eval on a non-foldable arg (e.g. a
    // column reference) throws an unbound-reference error instead of
    // this intended message
    if (args.length <= i || !args(i).foldable)
      throw new IllegalArgumentException(usage)
    args(i).eval() match {
      case n: Int => n
      case l: Long => l.toInt // BIGINT literals arrive as Long
      case other => throw new IllegalArgumentException(s"$usage, got $other")
    }
  }

  private def longLit(args: Seq[Expression], i: Int, usage: String): Long = {
    if (args.length <= i || !args(i).foldable)
      throw new IllegalArgumentException(usage)
    args(i).eval() match {
      case n: Int => n.toLong
      case l: Long => l
      case other => throw new IllegalArgumentException(s"$usage, got $other")
    }
  }

  private def numLit(args: Seq[Expression], i: Int, usage: String): Double = {
    if (args.length <= i || !args(i).foldable)
      throw new IllegalArgumentException(usage)
    args(i).eval() match {
      case d: Double => d
      case dec: org.apache.spark.sql.types.Decimal => dec.toDouble // SQL 0.01
      case n: Int => n.toDouble
      case l: Long => l.toDouble
      case other => throw new IllegalArgumentException(s"$usage, got $other")
    }
  }

  /** Every graft SQL function: scalar codegen expressions, the custom
    * aggregates (`SELECT doc_id, simhash(tok), minhash(shingle, 32) …
    * GROUP BY doc_id`), the sketch build/probe pairs, and the PII scrub
    * (the reference's customization point is user-editable SQL, so the
    * curation transform must be reachable from it — built as a direct
    * catalyst tree on the single-sourced TextAnalysis patterns, so SQL
    * and Column callers scrub identically). */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> ((args: Seq[Expression]) => FloatVecDot(args.head, args(1))),
    "vec_cosine" -> ((args: Seq[Expression]) => FloatVecCosine(args.head, args(1))),
    "vec_norm" -> ((args: Seq[Expression]) => FloatVecNorm(args.head)),
    "sorted_intersect_size" ->
      ((args: Seq[Expression]) => SortedIntersectSize(args.head, args(1))),
    "bit_interleave" -> ((args: Seq[Expression]) => BitInterleave(args.head, args(1),
      intLit(args, 2, "bit_interleave(x, y, bits): bits must be an integer literal"))),
    "bit_interleave_n" -> ((args: Seq[Expression]) => BitInterleaveN(args.init,
      intLit(args, args.size - 1,
        "bit_interleave_n(x1, ..., xn, bits): bits must be an integer literal"))),
    "simhash" -> ((args: Seq[Expression]) => SimHashAgg(args.head).toAggregateExpression()),
    "minhash" -> ((args: Seq[Expression]) => MinHashAgg(args.head,
      intLit(args, 1, "minhash(col, k): k must be an integer literal"))
      .toAggregateExpression()),
    "topk" -> ((args: Seq[Expression]) => TopKAgg(args.head, args(1),
      intLit(args, 2, "topk(score, id, k): k must be an integer literal"))
      .toAggregateExpression()),
    // sketch build/probe pairs:
    //   SELECT bloom_agg(key, 1000000, 0.01) FROM ref
    //   SELECT * FROM cand WHERE bloom_might_contain(X'…', key)
    "bloom_agg" -> ((args: Seq[Expression]) => BloomFilterAgg(args.head,
      longLit(args, 1, "bloom_agg(col, expectedItems, fpp): expectedItems must be an integer literal"),
      numLit(args, 2, "bloom_agg(col, expectedItems, fpp): fpp must be a numeric literal"))
      .toAggregateExpression()),
    "bloom_might_contain" ->
      ((args: Seq[Expression]) => BloomMightContain(args.head, args(1))),
    "count_min_agg" -> ((args: Seq[Expression]) => CountMinAgg(args.head,
      numLit(args, 1, "count_min_agg(col, eps, confidence, seed): eps must be a numeric literal"),
      numLit(args, 2, "count_min_agg(col, eps, confidence, seed): confidence must be a numeric literal"),
      intLit(args, 3, "count_min_agg(col, eps, confidence, seed): seed must be an integer literal"))
      .toAggregateExpression()),
    "count_min_estimate" ->
      ((args: Seq[Expression]) => CountMinEstimate(args.head, args(1))),
    "scrub_pii" -> ((args: Seq[Expression]) => GraftFunctions.scrubPiiExpr(args.head)))

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }

  /** regexp_replace(regexp_replace(text, email, '<EMAIL>'), phone,
    * '<PHONE>') as a raw expression tree — shared by the imperative
    * registry and the SparkSessionExtensions deployment path. */
  def scrubPiiExpr(text: Expression): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, RegExpReplace}
    RegExpReplace(
      RegExpReplace(text,
        Literal(graft.operators.TextAnalysis.emailPattern), Literal("<EMAIL>")),
      Literal(graft.operators.TextAnalysis.phonePattern), Literal("<PHONE>"))
  }
}
