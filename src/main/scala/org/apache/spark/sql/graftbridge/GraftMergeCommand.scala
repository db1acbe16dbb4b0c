package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand

/** The executable form `MERGE INTO <hub table>` is rewritten to by
  * [[graft.sources.HubMergeRule]]: one ACID merge-upsert commit through
  * the versioned hub's own writer (same semantics as the library and the
  * connector write path — last-writer-wins on the keys, null keys insert,
  * schema widening). `deletes`, when present (MERGE DELETE branches),
  * carries the matched-and-deleted keys — removed in the SAME atomic
  * commit, before the upsert. Lives in the spark.sql package tree because
  * `LeafRunnableCommand` is `private[sql]` (same precedent as
  * [[ColumnBridge]]).
  */
case class GraftMergeCommand(path: String, keys: Seq[String],
    source: LogicalPlan,
    deletes: Option[LogicalPlan] = None) extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    val classic = session.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    graft.writers.VersionedHub.write(
      session,
      org.apache.spark.sql.classic.Dataset.ofRows(classic, source),
      path, keys,
      deletes = deletes.map(
        org.apache.spark.sql.classic.Dataset.ofRows(classic, _)))
    Seq.empty
  }

  override def simpleString(maxFields: Int): String =
    s"GraftMergeCommand hub=$path keys=${keys.mkString(",")}" +
      (if (deletes.isDefined) " +deletes" else "")
}
