package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{ElementAt, Expression, ExpressionInfo}

import graft.functions.{FloatVecCosine, FloatVecDot, FloatVecNorm}

/** SparkSessionExtensions entry point: injects graft's native functions at
  * session build time, so a cluster deployment enables the whole SQL
  * surface with
  *
  *   --conf spark.sql.extensions=graft.GraftExtensions
  *
  * (the same registrations `GraftSession.prepare` performs imperatively
  * for an existing session).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot"),
      (args: Seq[Expression]) => FloatVecDot(args.head, args(1))))
    ext.injectFunction((FunctionIdentifier("vec_cosine"),
      info("vec_cosine"),
      (args: Seq[Expression]) => FloatVecCosine(args.head, args(1))))
    ext.injectFunction((FunctionIdentifier("vec_norm"),
      info("vec_norm"),
      (args: Seq[Expression]) => FloatVecNorm(args.head)))
    ext.injectFunction((FunctionIdentifier("list_element"),
      info("list_element"),
      (args: Seq[Expression]) => ElementAt(args.head, args(1), None, failOnError = false)))
    ext.injectFunction((FunctionIdentifier("scrub_pii"),
      info("scrub_pii"),
      (args: Seq[Expression]) =>
        graft.functions.GraftFunctions.scrubPiiExpr(args.head)))
  }
}
