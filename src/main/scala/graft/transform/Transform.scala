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

  def toHub(df: DataFrame, source: Source): DataFrame =
    overrides.getOrElse(source.id, identityTransform)(df, source)
}
