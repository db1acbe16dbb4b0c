package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Cast, Expression, Literal, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graftbridge.{FilterBridge, GraftUpdateCommand}

/** Resolution rule making `UPDATE` SQL work against graft-hub tables
  * (registered by [[graft.GraftExtensions]]):
  *
  * {{{ UPDATE hub.default.t SET v = concat(v, '!'), n = n + 1 WHERE k < 5 }}}
  *
  * Rewrites to one ACID [[graft.writers.VersionedHub.updateWhere]] commit:
  * candidate buckets bounded by the manifest's bucket hashing + per-file
  * stats (from the WHERE's translatable conjuncts, re-judged inside every
  * commit retry), only buckets holding matches rewritten, everything else
  * shared structurally — the Delta-UPDATE surface the reference's
  * `writer.py` world delegates to Delta (writer.py:25-29).
  *
  * SET values and the WHERE evaluate against the PRE-update row (standard
  * SQL UPDATE), values cast to their column's type (ANSI failures surface
  * at runtime like any SQL cast). Refused loudly: time-travel targets,
  * subqueries in SET/WHERE (a snapshot-joined rewrite the hub does not
  * implement), nested-field assignments, and bucket-routing columns
  * (updateWhere's own guard — re-routing would strand rows).
  */
case class HubUpdateRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def hubOf(plan: LogicalPlan): Option[HubTable] =
    plan.collectFirst {
      case r: DataSourceV2Relation if r.table.isInstanceOf[HubTable] =>
        r.table.asInstanceOf[HubTable]
    }

  private def fail(what: String): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      errorClass = "UNSUPPORTED_FEATURE.TABLE_OPERATION",
      messageParameters = Map(
        "tableName" -> "graft-hub",
        "operation" ->
          (s"this UPDATE shape ($what). graft-hub UPDATE supports " +
            "SET <top-level column> = <expression over this row's " +
            "columns> [, ...] WHERE <predicate over this row's columns>")))

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case u: UpdateTable
        if u.table.resolved && u.assignments.forall(_.resolved) &&
          u.condition.forall(_.resolved) && hubOf(u.table).isDefined =>
      val table = hubOf(u.table).get
      if (table.isTimeTravel)
        fail("cannot UPDATE a VERSION AS OF snapshot")
      val targetAttrs = u.table.outputSet
      for (e <- u.assignments.map(_.value) ++ u.condition)
        if (e.exists(_.isInstanceOf[SubqueryExpression]))
          fail("subqueries in SET/WHERE are not supported")
      val sets = u.assignments.map { a =>
        val key = a.key match {
          case ar: AttributeReference if targetAttrs.contains(ar) => ar
          case other => fail(s"assignment target $other is not a top-level " +
            "column of the hub table")
        }
        val value =
          if (a.value.dataType == key.dataType) a.value
          else Cast(a.value, key.dataType)
        key.name -> value
      }
      val cond = u.condition.getOrElse(Literal.TrueLiteral)
      // translatable conjuncts bound the candidate buckets; the rest only
      // widen the set (pruning is an optimization, the full predicate is
      // re-applied row-by-row)
      val filters = u.condition.toSeq
        .flatMap(PredicateHelperObj.splitConjunctivePredicates)
        .flatMap(FilterBridge.translate)
      GraftUpdateCommand(table.hubPath, sets, cond, filters)
  }
}

/** [[org.apache.spark.sql.catalyst.expressions.PredicateHelper]] is a
  * trait; this object exposes its conjunct splitter to the rule above.
  */
private object PredicateHelperObj
    extends org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  override def splitConjunctivePredicates(
      condition: org.apache.spark.sql.catalyst.expressions.Expression)
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
    super.splitConjunctivePredicates(condition)
}
