package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand

/** The executable form `MERGE INTO <hub table>` is rewritten to by
  * [[graft.sources.HubMergeRule]]: one ACID merge-upsert commit through
  * the versioned hub's own writer (same semantics as the library and the
  * connector write path — last-writer-wins on the keys, null keys insert,
  * schema widening). Lives in the spark.sql package tree because
  * `LeafRunnableCommand` is `private[sql]` (same precedent as
  * [[ColumnBridge]]).
  */
case class GraftMergeCommand(path: String, keys: Seq[String],
    source: LogicalPlan) extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    graft.writers.VersionedHub.write(
      session,
      org.apache.spark.sql.classic.Dataset.ofRows(
        session.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
        source),
      path, keys)
    Seq.empty
  }

  override def simpleString(maxFields: Int): String =
    s"GraftMergeCommand hub=$path keys=${keys.mkString(",")}"
}
