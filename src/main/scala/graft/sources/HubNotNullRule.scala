package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.ResolvedTable
import org.apache.spark.sql.catalyst.plans.logical.{AlterColumns, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand

/** Resolution rule making `ALTER TABLE … ALTER COLUMN … SET NOT NULL`
  * work against graft-hub tables (registered by
  * [[graft.GraftExtensions]]). Spark's CheckAnalysis refuses ANY
  * nullable→non-nullable change on a v2 table — it cannot know whether
  * the data qualifies — so the resolved [[AlterColumns]] is intercepted
  * BEFORE that check and rewritten to [[GraftSetNotNullCommand]], which
  * validates standing data and lowers onto the synthetic `notnull_<col>`
  * CHECK ([[HubCatalog.foldNotNull]] — identical machinery to the
  * catalog's own TableChange path and CREATE-time NOT NULL). DROP NOT
  * NULL needs no interception: relaxing passes CheckAnalysis and reaches
  * the catalog's alterTable normally.
  *
  * Only statements whose every spec is a pure SET NOT NULL are rewritten;
  * mixed ALTER COLUMN forms keep Spark's loud refusal.
  */
case class HubNotNullRule(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case AlterColumns(r: ResolvedTable, specs)
        if r.table.isInstanceOf[HubTable] && specs.nonEmpty &&
          specs.forall(s => s.newNullability.contains(false) &&
            s.newDataType.isEmpty && s.newComment.isEmpty &&
            s.newPosition.isEmpty && s.newDefaultExpression.isEmpty &&
            !s.dropDefault) =>
      val cols = specs.map { s =>
        require(s.column.name.length == 1,
          "graft-hub NOT NULL supports top-level columns only, got " +
            s.column.name.mkString("."))
        s.column.name.head
      }
      GraftSetNotNullCommand(r.table.asInstanceOf[HubTable].hubPath, cols)
  }
}

/** The executable form of SET NOT NULL: one manifest-only commit folding
  * each column's synthetic check in (standing data validated inside the
  * fold, re-judged against the FRESH base on every commit retry).
  */
case class GraftSetNotNullCommand(path: String, cols: Seq[String])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    // idempotence at the COMMIT level: if every column already carries its
    // lowered check, re-SET must not burn a manifest version (the fold
    // inside still re-judges against the fresh base, so a racing DROP
    // between this probe and the commit resolves correctly)
    val current = graft.writers.VersionedHub.latest(session, path)
      .map(_.checks).getOrElse(Map.empty)
    val missing = cols.filterNot(c => current.keys
      .exists(_.equalsIgnoreCase(HubCatalog.notNullName(c))))
    if (missing.nonEmpty)
      graft.writers.VersionedHub.alterSchema(session, path, identity,
        Map.empty,
        alterChecks = checks => cols.foldLeft(checks)((m, c) =>
          HubCatalog.foldNotNull(session, path, m, c, nullable = false)))
    Seq.empty
  }

  override def simpleString(maxFields: Int): String =
    s"GraftSetNotNullCommand hub=$path cols=${cols.mkString(",")}"
}
