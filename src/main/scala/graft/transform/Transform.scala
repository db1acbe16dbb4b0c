package graft.transform

import graft.catalog.Source
import org.apache.spark.sql.DataFrame

/** RAW→HUB transform hook.
  *
  * The reference's `to_hub` is the identity with a commented-out
  * column-selection scaffold (metadata_ingestion/src/ingestion_framework/
  * transform.py:5-9). We keep it as a named extension point: a per-source
  * override can be registered, and the default is identity.
  */
object Transform {

  type HubTransform = (DataFrame, Source) => DataFrame

  val identityTransform: HubTransform = (df, _) => df

  @volatile private var overrides: Map[String, HubTransform] = Map.empty

  /** Register a custom RAW→HUB transform for a source id. */
  def register(sourceId: String, t: HubTransform): Unit =
    synchronized { overrides = overrides + (sourceId -> t) }

  /** Merge tiebreak column: always carried through a keep-cols projection —
    * without it HubWriter.merge degrades to `_is_new`-only ordering and the
    * within-batch duplicate-key survivor becomes nondeterministic.
    */
  private val MergeTiebreak = "_ingest_ts_utc"

  /** Declarative column selection — the reference's commented-out
    * `keep_cols` scaffold (transform.py:6-8) as a catalog field. Validates
    * that the kept set exists and still contains the hub primary keys (a
    * keep-list that drops a merge key would corrupt the upsert). The
    * `_ingest_ts_utc` audit column is retained implicitly when present:
    * it is the merge's last-writer-wins tiebreak.
    */
  val keepColsTransform: HubTransform = (df, s) => {
    if (s.hubKeepCols.isEmpty) df
    else {
      val missing = s.hubKeepCols.filterNot(df.columns.contains)
      require(missing.isEmpty,
        s"[${s.id}] hub_keep_cols not in source schema: ${missing.mkString(", ")}")
      val droppedKeys = s.hubPrimaryKeys.filterNot(s.hubKeepCols.contains)
      require(droppedKeys.isEmpty,
        s"[${s.id}] hub_keep_cols drops hub primary keys: ${droppedKeys.mkString(", ")}")
      val keep = s.hubKeepCols ++
        (if (df.columns.contains(MergeTiebreak) &&
          !s.hubKeepCols.contains(MergeTiebreak)) Seq(MergeTiebreak) else Nil)
      df.select(keep.map(df.col): _*)
    }
  }

  /** A registered override COMPOSES with the declarative keep-cols: the
    * override runs first (it may compute/rename columns), then the
    * projection + key validation applies — a YAML keep-list can never be
    * silently ignored by code registering a custom transform.
    */
  def toHub(df: DataFrame, source: Source): DataFrame = {
    val custom = overrides.getOrElse(source.id, identityTransform)(df, source)
    keepColsTransform(custom, source)
  }
}
