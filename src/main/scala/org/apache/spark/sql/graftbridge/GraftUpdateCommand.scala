package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.DataSourceStrategy
import org.apache.spark.sql.sources.Filter

/** Catalyst → DSv1 filter translation for the hub's row-level commands.
  * `DataSourceStrategy.translateFilter` is `protected[sql]`, hence this
  * bridge (same precedent as [[ColumnBridge]]). Untranslatable conjuncts
  * return None — callers drop them, which for candidate-bucket pruning
  * only WIDENS the candidate set (sound).
  */
object FilterBridge {
  def translate(e: Expression): Option[Filter] =
    DataSourceStrategy.translateFilter(e, supportNestedPredicatePushdown = true)
}

/** The executable form `UPDATE <hub table> SET ... WHERE ...` is rewritten
  * to by [[graft.sources.HubUpdateRule]]: one ACID commit rewriting only
  * the buckets that hold matching rows, through
  * [[graft.writers.VersionedHub.updateWhere]]. `sets` and `condition`
  * arrive RESOLVED (CheckAnalysis walks command expressions); at run time
  * their target attribute references are rewritten to name-based
  * unresolved attributes so they re-resolve against each commit attempt's
  * fresh snapshot read (the analysis plan's exprIds mean nothing there).
  * `filters` are the condition's translatable conjuncts, used only to
  * bound the candidate buckets from manifest stats (recomputed per retry
  * — see deleteWhere's race note).
  */
case class GraftUpdateCommand(path: String,
    sets: Seq[(String, Expression)],
    condition: Expression,
    filters: Seq[Filter]) extends LeafRunnableCommand {

  private def byName(e: Expression): Expression = e.transform {
    case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
      org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
        .quoted(a.name)
  }

  override def run(session: SparkSession): Seq[Row] = {
    graft.writers.VersionedHub.updateWhere(
      session,
      path,
      ColumnBridge.column(byName(condition)),
      sets.map { case (c, e) => c -> ColumnBridge.column(byName(e)) },
      graft.sources.HubDataSource.rowLevelCandidates(session, path, filters))
    Seq.empty
  }

  override def simpleString(maxFields: Int): String =
    s"GraftUpdateCommand hub=$path set=${sets.map(_._1).mkString(",")}"
}
