package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

import graft.operators.TimeTravel
import graft.sources.GraftVersionedMorRelation

/** Optimizer rule: splice the merge-on-read versioned-table relation's
  * REAL logical scan (native vectorized parquet + the deletion-vector
  * anti-join + the logical-name projection) in place of the V1
  * [[GraftVersionedMorRelation]] — the Delta `PrepareDeltaScan` design.
  * The V1 relation's `buildScan` is correct but pays a Row boundary
  * (internal → external → internal row conversion around the
  * RowDataSourceScanExec seam); the spliced plan keeps whole-stage
  * codegen end to end and lets Catalyst push the query's own filters
  * through the anti-join down to the parquet readers.
  *
  * A filter sitting directly on the relation ALSO drives log-stats
  * file skipping: its conjuncts translate to
  * [[TimeTravel.ColRange]]s and prune the version's file list (range
  * stats + bloom probes) before the scan is even planned, exactly what
  * the relation's `buildScan` does for pushed filters — and the Filter
  * node stays in place, so skipping remains the superset-prune
  * optimization it must be. Output attributes re-alias to the
  * relation's ORIGINAL exprIds, so every parent reference resolves
  * unchanged.
  *
  * Gated on `spark.graft.mor.rewrite` (set by the tuned sessions;
  * DEFAULT FALSE) so plan shape is deterministic per session rather
  * than per rule-install order — with the flag off, the V1 fallback
  * serves, same results. Idempotent: the splice removes the only node
  * shape the rule matches. */
object MorScanRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("spark.graft.mor.rewrite", "false").toBoolean)
      plan
    // transformDOWN: the Project/Filter-over-relation patterns must
    // match at the parent BEFORE the bare-relation case consumes the
    // child (an upward transform rewrites the relation first and the
    // parent cases never fire)
    else plan.transformDown {
      // a Project above the relation captures the query's REQUIRED
      // columns: the splice runs after Spark's own ColumnPruning, so
      // without threading them a narrow query over a DV-bound version
      // would physically read every column of the table
      case p @ Project(_, Filter(cond, lr: LogicalRelation))
          if lr.relation.isInstanceOf[GraftVersionedMorRelation] =>
        p.copy(child = spliced(lr, TimeTravel.predicateRanges(cond),
          Some(cond), requiredOf(p, lr)))
      case p @ Project(_, lr: LogicalRelation)
          if lr.relation.isInstanceOf[GraftVersionedMorRelation] =>
        p.copy(child = spliced(lr, Nil, None, requiredOf(p, lr)))
      // a filter directly on the relation is CONSUMED whole: its
      // conjuncts drive log-stats file skipping, and the full condition
      // re-optimizes WITH the spliced subplan so parquet pushdown
      // happens even though Spark's own pushdown batches already ran
      case Filter(cond, lr: LogicalRelation)
          if lr.relation.isInstanceOf[GraftVersionedMorRelation] =>
        spliced(lr, TimeTravel.predicateRanges(cond), Some(cond), None)
      case lr: LogicalRelation
          if lr.relation.isInstanceOf[GraftVersionedMorRelation] =>
        spliced(lr, Nil, None, None)
    }

  /** The parent projection's referenced columns, in relation order —
    * what the spliced subplan needs to output (filter references stay
    * inside the subplan and prune there). */
  private def requiredOf(p: Project,
      lr: LogicalRelation): Option[Seq[String]] = {
    val refs = p.projectList.flatMap(_.references.map(_.name)).toSet
    Some(lr.output.map(_.name).filter(refs))
  }

  private def spliced(lr: LogicalRelation,
      preds: Seq[TimeTravel.ColRange],
      cond: Option[org.apache.spark.sql.catalyst.expressions.Expression],
      required: Option[Seq[String]]): LogicalPlan = {
    val mor = lr.relation.asInstanceOf[GraftVersionedMorRelation]
    val replacement = mor.logicalScan(preds, cond, required)
    val byName = replacement.output.map(a => a.name -> a).toMap
    // the committed schema is the contract on both sides; a drifted
    // replacement (a column the relation promises but the scan lacks)
    // must fail the rewrite loudly, never bind by position
    val wanted = required.fold(lr.output)(r =>
      { val keep = r.toSet; lr.output.filter(a => keep(a.name)) })
    val projections: Seq[NamedExpression] = wanted.map { o =>
      val src = byName.getOrElse(o.name, throw new IllegalStateException(
        s"MorScanRewrite: replacement scan lacks column '${o.name}' " +
          s"(has: ${replacement.output.map(_.name).mkString(", ")})"))
      Alias(src, o.name)(exprId = o.exprId, qualifier = o.qualifier)
    }
    Project(projections, replacement)
  }
}
