package graft.writers

import org.apache.spark.sql.types.{MetadataBuilder, StructType}

/** Per-column PARQUET BLOOM FILTER indexing for hub tables — the Delta
  * bloom-index analogue (`delta.bloomFilter` columns,
  * reference's hub tables delegate to Delta, writer.py:18-36) realized the
  * Iceberg way: the bloom lives in each parquet file's own footer
  * (`parquet.bloom.filter.enabled#<col>`), NOT in the commit log, so the
  * manifest stays O(touched files) no matter how many values a file holds.
  *
  * The column set is recorded as field metadata in the snapshot schema
  * ([[BloomKey]]), which every commit path already carries forward — there
  * is no table-property store to invent. Every writer consults the schema
  * being recorded and passes the matching writer options
  * ([[options]]), keyed by the column's PHYSICAL name under column
  * mapping, so renamed columns keep their index.
  *
  * Reading needs no code at all: pushed predicates reach the inner parquet
  * scan (see `HubScan.inner`), and Spark's parquet source consults footer
  * blooms for equality/IN row-group pruning natively. Blooms close exactly
  * the gap min/max zone maps leave: point lookups on high-cardinality
  * columns whose values are scattered, where every file's [min,max]
  * straddles the probe.
  *
  * Files written BEFORE the index was enabled simply carry no bloom — they
  * are scanned as before; OPTIMIZE/compaction rewrites them with blooms.
  */
object BloomIndex {

  /** Field-metadata key: `true` = write a parquet bloom for this column. */
  val BloomKey = "graft.bloomFilter"

  def enabled(s: StructType): Seq[String] =
    s.fields.toSeq.collect {
      case f if f.metadata.contains(BloomKey) &&
        f.metadata.getBoolean(BloomKey) => f.name
    }

  /** DataFrameWriter options for a snapshot about to be written under
    * `mapped`'s recorded schema (empty for tables without an index —
    * the zero-cost default).
    */
  def options(mapped: StructType): Map[String, String] =
    mapped.fields.toSeq.collect {
      case f if f.metadata.contains(BloomKey) && f.metadata.getBoolean(BloomKey) =>
        s"parquet.bloom.filter.enabled#${ColumnMapping.physName(f)}" -> "true"
    }.toMap

  /** Flag/unflag `cols` in a snapshot schema (the `alterSchema` transform
    * behind `CALL hub.system.bloom_index`).
    */
  def flag(s: StructType, cols: Seq[String], enable: Boolean): StructType = {
    val missing = cols.filterNot(c => s.fieldNames.exists(_.equalsIgnoreCase(c)))
    require(missing.isEmpty,
      s"bloom_index: column(s) ${missing.mkString(", ")} do not exist")
    StructType(s.fields.map { f =>
      if (!cols.exists(_.equalsIgnoreCase(f.name))) f
      else f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
        .putBoolean(BloomKey, enable).build())
    })
  }
}
