package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{ElementAt, Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: injects graft's native functions at
  * session build time, so a cluster deployment enables the whole SQL
  * surface with
  *
  *   --conf spark.sql.extensions=graft.GraftExtensions
  *
  * (the same registrations `GraftSession.prepare` performs imperatively
  * for an existing session). The function list is single-sourced from
  * [[graft.functions.GraftFunctions.builders]] — both paths expose the
  * identical surface: scalar codegen expressions, custom aggregates,
  * sketch build/probe pairs, PII scrub — plus the `list_element` dialect
  * shim (reference parity: 1-based, NULL out-of-range).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name), builder))
    }
    ext.injectFunction((FunctionIdentifier("list_element"),
      info("list_element"),
      (args: Seq[Expression]) => ElementAt(args.head, args(1), None, failOnError = false)))
    // optimizer surface: the lossless bounded-edit-distance prefilter
    // (same rule GraftSession.installOptimizations adds imperatively)
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinPrefilter)
    // the merge-on-read scan splice (gated on spark.graft.mor.rewrite)
    ext.injectOptimizerRule(_ => graft.plans.MorScanRewrite)
    // name resolution: `graft.<registered-name>` readable from PLAIN
    // spark.sql — session registry first, then the durable warehouse
    // catalog file (see GraftNameResolution's scaladoc)
    ext.injectResolutionRule(s => graft.sql.GraftNameResolution(s))
  }
}
