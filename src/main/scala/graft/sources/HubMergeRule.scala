package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And => CatAnd, AttributeReference, Cast, EqualTo => CatEqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, InsertAction, InsertStarAction, LogicalPlan, MergeIntoTable, UpdateAction, UpdateStarAction}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graftbridge.GraftMergeCommand

/** Resolution rule making `MERGE INTO` SQL work against graft-hub tables
  * (registered by [[graft.GraftExtensions]]):
  *
  * {{{
  *   MERGE INTO hub.default.t AS t USING src AS s
  *   ON t.k = s.k
  *   WHEN MATCHED THEN UPDATE SET *
  *   WHEN NOT MATCHED THEN INSERT *
  * }}}
  *
  * The hub's merge IS this upsert (last-writer-wins on the keys, null-key
  * rows insert, schema widening — [[graft.writers.HubWriter.merge]]), so
  * the canonical MERGE shape rewrites to one ACID
  * [[graft.writers.VersionedHub.write]] commit with the keys extracted
  * from the ON equality conjuncts. Shapes the hub cannot express as its
  * keyed upsert — partial-column updates, conditional actions, DELETE
  * branches, NOT MATCHED BY SOURCE — are refused loudly rather than
  * silently approximated. Star actions are accepted both unexpanded
  * (`UPDATE SET *`) and as the analyzer's expanded full-column
  * name-matched assignment lists (possibly cast-wrapped: the hub widens
  * types on merge, its documented semantics).
  */
case class HubMergeRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def hubOf(plan: LogicalPlan): Option[HubTable] =
    plan.collectFirst {
      case r: DataSourceV2Relation if r.table.isInstanceOf[HubTable] =>
        r.table.asInstanceOf[HubTable]
    }

  /** Strip the wrappers the analyzer layers over star-expanded assignments
    * and coerced ON terms: casts (the hub widens on merge anyway) and
    * null-intolerance asserts.
    */
  private def unwrapCast(e: Expression): Expression = e match {
    case c: Cast => unwrapCast(c.child)
    case a: org.apache.spark.sql.catalyst.expressions.objects.AssertNotNull =>
      unwrapCast(a.child)
    case other => other
  }

  private def fail(what: String): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      errorClass = "UNSUPPORTED_FEATURE.TABLE_OPERATION",
      messageParameters = Map(
        "tableName" -> "graft-hub",
        "operation" ->
          (s"this MERGE shape ($what). graft-hub MERGE INTO supports " +
            "the keyed upsert form: ON equi-join of identically-named " +
            "columns, WHEN MATCHED THEN UPDATE SET *, WHEN NOT MATCHED " +
            "THEN INSERT *")))

  /** ON conjuncts → merge keys: every conjunct must equate a target column
    * with an identically-named source column.
    */
  private def keysOf(cond: Expression, target: LogicalPlan,
      source: LogicalPlan): Seq[String] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case CatAnd(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    conjuncts(cond).map(c => (c, c match {
      case CatEqualTo(l, r) => (unwrapCast(l), unwrapCast(r))
      case other => (other, other)
    })).map {
      case (_, (a: AttributeReference, b: AttributeReference)) =>
        val (t, s) =
          if (target.outputSet.contains(a) && source.outputSet.contains(b))
            (a, b)
          else if (target.outputSet.contains(b) && source.outputSet.contains(a))
            (b, a)
          else fail(s"ON condition term $a = $b does not equate a target " +
            "column with a source column")
        if (!t.name.equalsIgnoreCase(s.name))
          fail(s"ON equates differently-named columns ${t.name} and " +
            s"${s.name}; the hub merge keys by column NAME")
        t.name
      case (orig, _) => fail(s"unsupported ON condition term $orig")
    }.distinct
  }

  /** An expanded assignment list is "star-like" when it covers every target
    * column with the identically-named source column (casts allowed — the
    * hub widens on merge).
    */
  private def starLike(assigns: Seq[Assignment], target: LogicalPlan,
      source: LogicalPlan): Boolean = {
    val covered = assigns.flatMap { a =>
      (unwrapCast(a.key), unwrapCast(a.value)) match {
        case (k: AttributeReference, v: AttributeReference)
            if k.name.equalsIgnoreCase(v.name) &&
              target.outputSet.contains(k) && source.outputSet.contains(v) =>
          Some(k.name.toLowerCase(java.util.Locale.ROOT))
        case _ => None
      }
    }
    covered.length == assigns.length &&
      target.output.map(_.name.toLowerCase(java.util.Locale.ROOT))
        .forall(covered.toSet.contains)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case m: MergeIntoTable
        if m.targetTable.resolved && m.sourceTable.resolved &&
          m.mergeCondition.resolved && hubOf(m.targetTable).isDefined =>
      val table = hubOf(m.targetTable).get
      val path = table.hubPath
      if (table.isTimeTravel)
        fail("cannot MERGE INTO a VERSION AS OF snapshot")
      val keys = keysOf(m.mergeCondition, m.targetTable, m.sourceTable)
      if (keys.isEmpty) fail("no usable key equalities in ON")
      m.matchedActions match {
        case Seq(UpdateStarAction(None)) => ()
        case Seq(UpdateAction(None, assigns, _))
            if starLike(assigns, m.targetTable, m.sourceTable) => ()
        case other => fail(s"unsupported WHEN MATCHED actions $other")
      }
      m.notMatchedActions match {
        case Seq(InsertStarAction(None)) => ()
        case Seq(InsertAction(None, assigns))
            if starLike(assigns, m.targetTable, m.sourceTable) => ()
        case other => fail(s"unsupported WHEN NOT MATCHED actions $other")
      }
      if (m.notMatchedBySourceActions.nonEmpty)
        fail("WHEN NOT MATCHED BY SOURCE is not supported")
      // the hub merge consumes the source's columns by NAME — align the
      // source column names to the target's exact casing
      val tgtNames: Map[String, String] = m.targetTable.output
        .map(a => a.name.toLowerCase(java.util.Locale.ROOT) -> a.name).toMap
      val projected = m.sourceTable.output.map { a =>
        tgtNames.get(a.name.toLowerCase(java.util.Locale.ROOT)) match {
          case Some(exact) if exact != a.name =>
            org.apache.spark.sql.catalyst.expressions.Alias(a, exact)()
          case _ => a
        }
      }
      val src =
        if (projected.forall(_.isInstanceOf[AttributeReference])) m.sourceTable
        else org.apache.spark.sql.catalyst.plans.logical.Project(
          projected, m.sourceTable)
      GraftMergeCommand(path, keys, src)
  }
}
