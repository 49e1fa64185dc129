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
  * API (`call_function`) and plain SQL. */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_dot",
      args => FloatVecDot(args.head, args(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_cosine",
      args => FloatVecCosine(args.head, args(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_norm",
      args => FloatVecNorm(args.head), "built-in")
    reg.createOrReplaceTempFunction("sorted_intersect_size",
      args => SortedIntersectSize(args.head, args(1)), "built-in")
    // the custom aggregates, reachable from plain SQL:
    //   SELECT doc_id, simhash(tok), minhash(shingle, 32) ... GROUP BY doc_id
    reg.createOrReplaceTempFunction("simhash",
      args => SimHashAgg(args.head).toAggregateExpression(), "built-in")
    reg.createOrReplaceTempFunction("minhash",
      args => {
        // foldable gate BEFORE eval(): eval on a non-foldable arg (e.g. a
        // column reference) throws an unbound-reference error instead of
        // this intended message
        if (args.length < 2 || !args(1).foldable)
          throw new IllegalArgumentException(
            "minhash(col, k): k must be an integer literal")
        val k = args(1).eval() match {
          case i: Int => i
          case l: Long => l.toInt // BIGINT literals arrive as Long
          case other => throw new IllegalArgumentException(
            s"minhash(col, k): k must be an integer literal, got $other")
        }
        MinHashAgg(args.head, k).toAggregateExpression()
      }, "built-in")
    reg.createOrReplaceTempFunction("topk",
      args => {
        // same foldable gate as minhash: k must be a literal
        if (args.length < 3 || !args(2).foldable)
          throw new IllegalArgumentException(
            "topk(score, id, k): k must be an integer literal")
        val k = args(2).eval() match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"topk(score, id, k): k must be an integer literal, got $other")
        }
        TopKAgg(args.head, args(1), k).toAggregateExpression()
      }, "built-in")
    // bloom sketch build + probe from plain SQL:
    //   SELECT bloom_agg(key, 1000000, 0.01) FROM ref
    //   SELECT * FROM cand WHERE bloom_might_contain(X'…', key)
    reg.createOrReplaceTempFunction("bloom_agg",
      args => {
        if (args.length < 3 || !args(1).foldable || !args(2).foldable)
          throw new IllegalArgumentException(
            "bloom_agg(col, expectedItems, fpp): expectedItems and fpp must be literals")
        val n = args(1).eval() match {
          case i: Int => i.toLong
          case l: Long => l
          case other => throw new IllegalArgumentException(
            s"bloom_agg: expectedItems must be an integer literal, got $other")
        }
        val p = args(2).eval() match {
          case d: Double => d
          case dec: org.apache.spark.sql.types.Decimal => dec.toDouble // SQL 0.01
          case other => throw new IllegalArgumentException(
            s"bloom_agg: fpp must be a numeric literal, got $other")
        }
        BloomFilterAgg(args.head, n, p).toAggregateExpression()
      }, "built-in")
    reg.createOrReplaceTempFunction("bloom_might_contain",
      args => BloomMightContain(args.head, args(1)), "built-in")
    // count-min frequency sketch build + probe from plain SQL
    reg.createOrReplaceTempFunction("count_min_agg",
      args => {
        if (args.length < 4 || !args.tail.forall(_.foldable))
          throw new IllegalArgumentException(
            "count_min_agg(col, eps, confidence, seed): eps/confidence/seed must be literals")
        def num(e: org.apache.spark.sql.catalyst.expressions.Expression): Double =
          e.eval() match {
            case d: Double => d
            case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
            case i: Int => i.toDouble
            case l: Long => l.toDouble
            case other => throw new IllegalArgumentException(
              s"count_min_agg: expected a numeric literal, got $other")
          }
        CountMinAgg(args.head, num(args(1)), num(args(2)),
          num(args(3)).toInt).toAggregateExpression()
      }, "built-in")
    reg.createOrReplaceTempFunction("count_min_estimate",
      args => CountMinEstimate(args.head, args(1)), "built-in")
    // PII scrub on the SQL surface — the reference's customization point
    // is user-editable SQL, so the curation transform must be reachable
    // from it. Built as a direct catalyst tree (the Column bridge wraps
    // Spark-4 Columns in unevaluable node expressions on this path); the
    // patterns are the single-sourced TextAnalysis constants, so SQL and
    // Column callers scrub identically.
    reg.createOrReplaceTempFunction("scrub_pii",
      args => GraftFunctions.scrubPiiExpr(args.head), "built-in")
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
