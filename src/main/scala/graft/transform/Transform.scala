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

  /** Declarative column selection — the reference's commented-out
    * `keep_cols` scaffold (transform.py:6-8) as a catalog field. Validates
    * that the kept set exists and still contains the hub primary keys (a
    * keep-list that drops a merge key would corrupt the upsert).
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
      df.select(s.hubKeepCols.map(df.col): _*)
    }
  }

  def toHub(df: DataFrame, source: Source): DataFrame =
    overrides.getOrElse(source.id, keepColsTransform)(df, source)
}
