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

/** pq_encode(embedding): the vector's `m` product-quantization codes —
  * per subspace, the index of the L2-nearest codebook centroid
  * (smallest-index tie-break) — in ONE codegen'd pass.
  *
  * Replaces the `slice`+`zip_with`+`aggregate`+`array_min`+
  * `array_position` formulation: that builds m×kCent interpreted
  * higher-order-function expressions per row (each allocating a zipped
  * array and binding lambda variables element by element) and breaks
  * whole-stage codegen for the scan — profiled at ~2/3 of the whole PQ
  * chain's wall time. Arithmetic is bit-identical to the HOF chain:
  * per element `(float→double − float→double)²`, summed in index order
  * from 0.0; the argmin comparison is `Double.compare < 0`, which is
  * exactly `array_min` + first-match `array_position` semantics (first
  * minimum wins ties, NaN sorts above every value). A vector whose
  * length differs from the codebook's dim yields NULL (the
  * [[FloatVecDot]] mismatch contract). */
case class PqEncode(child: Expression, codebook: Seq[Seq[Float]], m: Int)
  extends UnaryExpression {

  private val kCent = codebook.size
  private val dim = codebook.headOption.map(_.size).getOrElse(0)
  require(kCent > 0 && dim > 0 && m > 0 && dim % m == 0,
    s"pq_encode: bad codebook (kCent=$kCent, dim=$dim, m=$m)")
  private val sub = dim / m

  /** Codebook flattened row-major for the generated loop. */
  @transient private lazy val flat: Array[Float] = {
    val a = new Array[Float](kCent * dim)
    var j = 0
    while (j < kCent) {
      var i = 0
      while (i < dim) { a(j * dim + i) = codebook(j)(i); i += 1 }
      j += 1
    }
    a
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_encode expects ARRAY<FLOAT>, got ${other.simpleString}")
    }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() != dim) return null
    val codes = new Array[Int](m)
    val cb = flat
    var s = 0
    while (s < m) {
      var bestJ = 0
      var best = Double.MaxValue
      var j = 0
      while (j < kCent) {
        var acc = 0.0
        var i = 0
        val base = j * dim + s * sub
        val off = s * sub
        while (i < sub) {
          val d = x.getFloat(off + i).toDouble - cb(base + i).toDouble
          acc += d * d
          i += 1
        }
        if (j == 0 || java.lang.Double.compare(acc, best) < 0) {
          best = acc; bestJ = j
        }
        j += 1
      }
      codes(s) = bestJ
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", flat, "float[]")
    nullSafeCodeGen(ctx, ev, a => {
      val codes = ctx.freshName("codes")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val best = ctx.freshName("best")
      val bestJ = ctx.freshName("bestJ")
      val d = ctx.freshName("d")
      val base = ctx.freshName("base")
      val off = ctx.freshName("off")
      s"""
         |if ($a.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $codes = new int[$m];
         |  for (int $s = 0; $s < $m; $s++) {
         |    int $bestJ = 0;
         |    double $best = 0.0;
         |    int $off = $s * $sub;
         |    for (int $j = 0; $j < $kCent; $j++) {
         |      double $acc = 0.0;
         |      int $base = $j * $dim + $off;
         |      for (int $i = 0; $i < $sub; $i++) {
         |        double $d = (double)$a.getFloat($off + $i)
         |          - (double)$cbRef[$base + $i];
         |        $acc += $d * $d;
         |      }
         |      if ($j == 0 || java.lang.Double.compare($acc, $best) < 0) {
         |        $best = $acc; $bestJ = $j;
         |      }
         |    }
         |    $codes[$s] = $bestJ;
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** sq8_codes(embedding, norm): the vector's SQ8 codes as ARRAY<FLOAT> —
  * per element `round(v/norm·127/scale)` (Spark `Round` HALF_UP
  * semantics, int-cast, float-cast), all zeros when `norm` is 0 — in one
  * codegen'd pass. Replaces `transform(...)` + `cast(array<float>)`:
  * two interpreted array passes per row with per-element lambda binding.
  * Codes ≤ 127 are exact in float32, so emitting the post-cast float
  * image directly changes no bit of the downstream integer dot. */
case class Sq8Codes(left: Expression, right: Expression, scale: Double)
  extends BinaryExpression {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "sq8_codes"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sq8_codes expects (ARRAY<FLOAT>, DOUBLE), got " +
          s"${l.simpleString}, ${r.simpleString}")
    }

  /** One element's code under Spark's exact op chain:
    * `round(v/nm·127/scale)` — Round(double, 0) is
    * BigDecimal.valueOf + HALF_UP with NaN/Inf passthrough — then the
    * non-ANSI double→int cast, then int→float. */
  private def code(v: Double, nm: Double): Float = {
    val x = v / nm * 127.0 / scale
    val rounded =
      if (x.isNaN || x.isInfinite) x
      else java.math.BigDecimal.valueOf(x)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
    rounded.toInt.toFloat
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val nm = b.asInstanceOf[Double]
    val n = x.numElements()
    val out = new Array[Float](n)
    if (nm != 0.0) {
      var i = 0
      while (i < n) {
        out(i) = code(x.getFloat(i).toDouble, nm)
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("sq8", this,
      classOf[Sq8Codes].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
        s" $self.nullSafeEval($a, (Double)$b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Sq8Codes =
    copy(left = newLeft, right = newRight)
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
  /** PQ codes of `emb` over `cents` (float32-cast, the litVec contract). */
  def pqEncode(emb: Column, cents: Seq[Seq[Double]], m: Int): Column =
    column(PqEncode(expression(emb), cents.map(_.map(_.toFloat)), m))
  /** SQ8 codes of `emb` given its precomputed norm column. */
  def sq8Codes(emb: Column, nm: Column, scale: Double): Column =
    column(Sq8Codes(expression(emb), expression(nm), scale))
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
