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
    deletes: Option[LogicalPlan] = None,
    matchedKeys: Option[LogicalPlan] = None,
    nmbsNullKeys: Option[LogicalPlan] = None,
    insertKeys: Option[LogicalPlan] = None,
    targetKeys: Option[LogicalPlan] = None) extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    val classic = session.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    // SQL MERGE cardinality contract (general shape only): when several
    // source rows match ONE target row and any of them routes to an
    // UPDATE/DELETE branch, the outcome is order-dependent — SQL and Delta
    // raise instead of picking a winner, and so do we. One aggregate over
    // the already-planned key projection, shuffled on the same keys the
    // merge itself shuffles on. (The canonical UPDATE */INSERT * shape is
    // the hub's native upsert and keeps its DOCUMENTED last-writer-wins
    // semantics — it routes nothing to deletes, so no row can be deleted
    // and re-inserted nondeterministically.)
    // NOT MATCHED BY SOURCE refusal: a NULL-keyed target row routed to an
    // UPDATE/DELETE branch cannot be addressed by the keyed upsert/delete
    // (NULL never equi-matches) — silently skipping it would diverge from
    // the branch's semantics, and "updating" it through the upsert would
    // insert a duplicate. Fail loudly with the remedy instead.
    nmbsNullKeys.foreach { nk =>
      val hit = org.apache.spark.sql.classic.Dataset.ofRows(classic, nk)
        .limit(1).collect()
      if (hit.nonEmpty)
        throw new IllegalStateException(
          s"MERGE INTO hub at $path: a WHEN NOT MATCHED BY SOURCE branch " +
            s"applies to a target row whose merge key " +
            s"(${keys.mkString(", ")}) is NULL — the keyed commit cannot " +
            "address that row. Remove NULL-keyed rows first (DELETE FROM " +
            "with an IS NULL predicate) or exclude them via the branch " +
            "condition.")
    }
    matchedKeys.foreach { mk =>
      import org.apache.spark.sql.functions.{col, count, lit}
      val df = org.apache.spark.sql.classic.Dataset.ofRows(classic, mk)
      val dup = df.groupBy(df.columns.toIndexedSeq.map(col): _*)
        .agg(count(lit(1)).as("__graft_matches"))
        .filter(col("__graft_matches") > 1)
        .limit(1).collect()
      if (dup.nonEmpty)
        throw new IllegalStateException(
          s"MERGE INTO hub at $path: multiple source rows matched the " +
            s"target row with key (${keys.mkString(", ")}) = " +
            s"(${dup.head.toSeq.dropRight(1).mkString(", ")}) and " +
            "attempted to UPDATE/DELETE it — the result would be " +
            "nondeterministic. De-duplicate the source on the merge keys " +
            "(e.g. aggregate or QUALIFY row_number() = 1) and re-run.")
    }
    // Extra-ON-conjunct refusal: a source row routed to INSERT because
    // its key match was EXCLUDED by an extra ON predicate collides with
    // the surviving target row under that key — Delta stores both rows,
    // the keyed upsert would silently replace one. Refuse loudly, unless
    // this same commit deletes the conflicting target row (then the net
    // state matches Delta's: old row gone, new row in). One name-keyed
    // semi/anti join pair on the merge keys, limit-1 early exit.
    for (ik <- insertKeys; tk <- targetKeys) {
      val ins = org.apache.spark.sql.classic.Dataset.ofRows(classic, ik)
      val tgt = org.apache.spark.sql.classic.Dataset.ofRows(classic, tk)
      var conflict = ins.na.drop(keys).join(tgt, keys.toSeq, "left_semi")
      for (d <- deletes)
        conflict = conflict.join(
          org.apache.spark.sql.classic.Dataset.ofRows(classic, d),
          keys.toSeq, "left_anti")
      val hit = conflict.limit(1).collect()
      if (hit.nonEmpty)
        throw new IllegalStateException(
          s"MERGE INTO hub at $path: a WHEN NOT MATCHED INSERT row " +
            s"carries key (${keys.mkString(", ")}) = " +
            s"(${hit.head.toSeq.mkString(", ")}), which already exists " +
            "on a target row this merge leaves in place (the match was " +
            "excluded by an extra ON condition) — the keyed hub cannot " +
            "store two rows under one key, and upserting would silently " +
            "replace the existing row. Restrict the source to the same " +
            "predicate, or DELETE the conflicting rows in this MERGE.")
    }
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
