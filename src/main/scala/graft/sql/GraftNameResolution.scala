package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Analyzer rule making `graft.<name>` resolvable from PLAIN
  * `spark.sql` — no [[GraftSql]] wrapper: an unresolved two-part
  * relation whose first part is `graft` looks the name up in
  * [[graft.GraftSession]]'s registry (session bindings first, then the
  * durable warehouse catalog file) and splices in the versioned
  * table's latest-version read plan. Injected at session build time by
  * [[graft.GraftExtensions]] (`spark.sql.extensions=graft.GraftExtensions`
  * — the config every tuned session sets), so
  * `spark.sql("SELECT * FROM graft.orders_gold")` works in any session
  * built through the library's entry points or the conf.
  *
  * Unbound names fall through untouched — Spark's own
  * TABLE_OR_VIEW_NOT_FOUND error (with [[GraftSql]]'s richer listing
  * available on that surface) beats a half-resolved plan. Backticked
  * absolute paths (`graft.`/abs/path``) resolve directly, mirroring
  * [[graft.GraftSession.resolveTable]]. Streaming relations are left
  * alone: the stream surface is `graft-versioned`'s readStream face,
  * which has its own admission/offset contract.
  */
case class GraftNameResolution(spark: SparkSession)
    extends Rule[LogicalPlan] {

  private def graftPathOf(u: UnresolvedRelation): Option[String] =
    if (u.isStreaming || u.multipartIdentifier.length != 2 ||
        !u.multipartIdentifier.head.equalsIgnoreCase("graft")) None
    else {
      val x = u.multipartIdentifier(1)
      if (x.contains('/')) Some(x)
      else graft.GraftSession.tablePath(spark, x)
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      // time travel first: `graft.x VERSION/TIMESTAMP AS OF …` parses
      // to RelationTimeTravel over the unresolved relation — resolve
      // the pinned version, mirroring GraftSql's read rewrite
      case org.apache.spark.sql.catalyst.analysis.RelationTimeTravel(
          u: UnresolvedRelation, ts, version)
          if graftPathOf(u).isDefined =>
        val p = graftPathOf(u).get
        val v = version.map(_.toInt).getOrElse {
          val text = ts.map(GraftSql.timestampText)
            .getOrElse(throw new IllegalArgumentException(
              "time travel needs VERSION AS OF or TIMESTAMP AS OF"))
          graft.operators.TimeTravel.versionAsOf(spark, p,
            graft.sources.GraftVersionedRelation.parseTs(text))
        }
        graft.operators.TimeTravel.readVersion(spark, p, v)
          .queryExecution.analyzed
      case u: UnresolvedRelation if graftPathOf(u).isDefined =>
        val p = graftPathOf(u).get
        val latest =
          graft.operators.TimeTravel.latestVersion(spark, p)
        graft.operators.TimeTravel.readVersion(spark, p, latest)
          .queryExecution.analyzed
    }
}
