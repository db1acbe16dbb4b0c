package graft.writers

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{MetadataBuilder, StructField, StructType}

/** Delta-style COLUMN MAPPING, name mode (Delta's
  * `delta.columnMapping.mode = name`; the reference delegates its hub
  * tables to Delta, `writer.py:25-29`, where RENAME COLUMN needs exactly
  * this): every field of a recorded snapshot schema may carry the name the
  * PARQUET FILES spell it under — its *physical* name — in field metadata.
  * The physical name is frozen when the column is first written; `ALTER
  * TABLE RENAME COLUMN` changes only the *logical* name users query by, so
  * no data file is rewritten at any table size.
  *
  * Invariants that keep the mapping sound:
  *   - physical names are pairwise distinct: CREATE TABLE columns keep
  *     their (schema-distinct) names physically; every `ALTER TABLE ADD
  *     COLUMN` mints a fresh random `name#<hex>` physical name ('#' is
  *     refused in user column names, so the reserved namespace cannot
  *     collide with any logical name) — "never used before" is
  *     unanswerable once VACUUM truncates history, so adds never trust
  *     it; RENAME keeps the frozen physical name, so no two live columns
  *     can share a file column;
  *   - every writer lands files under PHYSICAL names ([[toPhysical]] at the
  *     write seams) and every reader scans with the physical schema then
  *     aliases back ([[toLogical]]), so a snapshot's file set stays
  *     homogeneous across renames — partial rewrites (UPDATE, compaction)
  *     cannot fork the file-column namespace;
  *   - per-file skipping stats are keyed by the FOOTER's (= physical)
  *     names; planners translate predicate attributes logical→physical
  *     ([[physOf]]) before consulting them.
  *
  * Tables that were never renamed carry no metadata and hit the
  * `hasMapping = false` identity fast paths everywhere — zero plan or
  * runtime change.
  */
private[graft] object ColumnMapping {

  /** Field-metadata key holding the column's immutable file name. */
  val PhysKey = "graft.physicalName"

  /** Refuse column names the engine reserves: '#' separates logical from
    * physical in column-mapping names, and `__graft_*` is the internal
    * plan-column namespace (DV addresses `__graft_dv_file`/`_pos`, merge
    * routing tags, …) — a user column under either would be silently
    * replaced by `withColumn` on the internal paths and then dropped.
    * Enforced at every column-creation point (CREATE TABLE, ADD COLUMN,
    * RENAME COLUMN); tables that predate the guard fall back to rewrite
    * paths instead of DV overlays (see `VersionedHub.dvDeleteAttempt`).
    */
  /** Internal columns the write plans mint with `withColumn` and later
    * drop — a user column by one of these names would be silently
    * clobbered by the first keyed upsert ("_is_new"/"_rn" in the merge
    * window) or bucket stamp ("_bucket").
    */
  private val ReservedPlanCols =
    Set(HubWriter.BucketCol, "_is_new", "_rn",
      // the change feed mints these over the data columns
      "_change_type", "_commit_version")

  def requireLegalName(name: String): Unit = {
    require(!name.contains('#'),
      s"column name $name may not contain '#' — reserved for " +
        "column-mapping physical names")
    val lc = name.toLowerCase(java.util.Locale.ROOT)
    require(!lc.startsWith("__graft_"),
      s"column name $name collides with the engine's reserved " +
        "__graft_* internal namespace")
    require(!ReservedPlanCols.contains(lc),
      s"column name $name collides with an internal write-plan column " +
        s"(reserved: ${ReservedPlanCols.mkString(", ")})")
  }

  def physName(f: StructField): String =
    if (f.metadata.contains(PhysKey)) f.metadata.getString(PhysKey) else f.name

  def hasMapping(s: StructType): Boolean =
    s.fields.exists(f => physName(f) != f.name)

  /** The schema as the parquet files spell it (identity when unmapped). */
  def physicalSchema(s: StructType): StructType =
    if (!hasMapping(s)) s
    else StructType(s.fields.map(f => f.copy(name = physName(f))))

  /** The file-column name a predicate/stat lookup on logical `c` must use.
    * Unknown columns pass through (a filter on a column the schema does not
    * carry can never prune anyway).
    */
  def physOf(s: StructType, c: String): String =
    s.find(_.name == c).map(physName).getOrElse(c)

  /** Alias a physically-named scan back to `s`'s logical names, in `s`'s
    * field order.
    */
  def toLogical(df: DataFrame, s: StructType): DataFrame =
    if (!hasMapping(s)) df
    else df.select(s.fields.map { f =>
      val p = physName(f)
      if (p == f.name) col(f.name) else col(p).as(f.name)
    }.toIndexedSeq: _*)

  /** Alias a logically-named snapshot to its file names before a write.
    * Columns absent from `s` (the bucket stamp) pass through untouched.
    */
  def toPhysical(df: DataFrame, s: StructType): DataFrame =
    if (!hasMapping(s)) df
    else {
      val l2p = s.fields.map(f => f.name -> physName(f)).toMap
      df.select(df.columns.toIndexedSeq.map { c =>
        l2p.get(c).filter(_ != c).fold(col(c))(p => col(c).as(p))
      }: _*)
    }

  /** The hub-owned metadata keys a recorded schema must never lose across
    * a commit: the column mapping and the bloom-index flag.
    */
  private def carriedKeys: Seq[String] = Seq(PhysKey, BloomIndex.BloomKey)

  /** Carry hub-owned metadata from the base snapshot's schema onto the
    * same-named fields of a freshly-derived schema about to be recorded
    * (DataFrame transformations — merges, coalesce projections — may drop
    * field metadata; the mapping and index flags must survive them).
    * Fields already carrying a key keep their own value.
    */
  def graft(s: StructType, base: Option[StructType]): StructType =
    base match {
      case Some(b)
          if b.fields.exists(f => carriedKeys.exists(f.metadata.contains)) =>
        val byName = b.fields.map(f => f.name -> f).toMap
        StructType(s.fields.map { f =>
          byName.get(f.name) match {
            case Some(bf) =>
              val missing = carriedKeys.filter(k =>
                bf.metadata.contains(k) && !f.metadata.contains(k))
              if (missing.isEmpty) f
              else {
                val mb = new MetadataBuilder().withMetadata(f.metadata)
                missing.foreach {
                  case k @ PhysKey => mb.putString(k, bf.metadata.getString(k))
                  case k => mb.putBoolean(k, bf.metadata.getBoolean(k))
                }
                f.copy(metadata = mb.build())
              }
            case None => f
          }
        })
      case _ => s
    }

  def withPhys(f: StructField, phys: String): StructField =
    f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .putString(PhysKey, phys).build())
}
