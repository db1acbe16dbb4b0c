package graft.sources

import java.util.{Map => JMap}

import graft.writers.{HubWriter, VersionedHub}

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SparkSession, SQLContext}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, Statistics, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics, V1Scan}
import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, EqualNullSafe, EqualTo, Filter, In, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 connector for the versioned hub — the idiomatic Spark
  * surface for a custom table format: `spark.read.format("graft-hub")
  * .option("path", hub).option("versionAsOf", 3).load()` instead of the
  * library call, so SQL users, BI tools, and other Spark code can consume
  * ACID hub snapshots without importing graft.
  *
  * Planning-time capabilities:
  *
  *   - **time travel** via `versionAsOf` (manifest-resolved snapshot, same
  *     contract as [[graft.writers.VersionedHub.read]]);
  *   - **bucket pruning from pushed filters**: an equality/IN predicate on
  *     the hub's bucket-routing column prunes the scan to the matching
  *     bucket DIRS at planning time ([[SupportsPushDownFilters]]) — the
  *     connector twin of [[graft.writers.VersionedHub.readBucketsFor]].
  *     Every filter is also returned for post-scan re-evaluation, so
  *     pruning can only skip data, never change semantics;
  *   - **column pruning** ([[SupportsPushDownRequiredColumns]]) — the
  *     projection reaches the inner parquet scan;
  *   - **schema-evolution safety**: output aligns to the manifest-recorded
  *     full-snapshot schema, so a column living only in pruned-away buckets
  *     reads as null instead of vanishing.
  *
  * Execution delegates to Spark's own parquet source over the pruned dirs
  * through the [[V1Scan]] bridge (the same bridge Spark's JDBC v2 connector
  * uses) — scan performance, vectorization, and further parquet pushdown
  * stay Spark-native instead of reimplemented.
  */
class HubDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-hub"

  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = SparkSession.active
    val path = HubDataSource.pathOf(options)
    val v = VersionedHub.versionAt(spark, path, HubDataSource.versionOf(options))
    VersionedHub.snapshotSchema(spark, path, v)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    new HubTable(HubDataSource.pathOf(options), HubDataSource.versionOf(options))
  }
}

object HubDataSource {

  private[sources] def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "graft-hub requires option(\"path\", ...)")
    p
  }

  private[sources] def versionOf(options: CaseInsensitiveStringMap): Option[Int] =
    Option(options.get("versionAsOf")).map(_.toInt)

  /** Bucket ids implied by the pushed filters, or None when pruning does
    * not apply (flat hub, multi-column routing, or no usable predicate).
    * Supports single-column routing with `=`, `<=>` and `IN` — each such
    * filter yields a bucket set; conjunctions intersect. Bucket ids come
    * from the SAME canonical-key hash the writer stamps with, evaluated in
    * one driver-local 1-task job over the literal values.
    */
  private[graft] def prunedBuckets(spark: SparkSession, fullSchema: StructType,
      v: VersionedHub.Version, filters: Seq[Filter]): Option[Set[Int]] = {
    if (v.buckets.isEmpty) return None
    val routing = v.bucketCols.getOrElse(return None)
    if (routing.size != 1) return None
    val c = routing.head
    val dt = fullSchema.find(_.name == c).map(_.dataType).getOrElse(return None)
    def buckets(values: Seq[Any]): Option[Set[Int]] =
      try {
        val n = v.nBuckets.getOrElse(v.buckets.keys.max + 1)
        val rows = values.map(Row(_))
        val df = spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 1),
          StructType(Seq(org.apache.spark.sql.types.StructField(c, dt))))
        Some(df.select(
            pmod(xxhash64(HubWriter.canonicalKey(col(c), dt)), lit(n))
              .cast("int"))
          .collect().map(_.getInt(0)).toSet)
      } catch { case _: Exception => None } // unprunable literal type: full scan
    val sets = filters.flatMap {
      case EqualTo(`c`, value) if value != null => buckets(Seq(value))
      case EqualNullSafe(`c`, value) if value != null => buckets(Seq(value))
      case In(`c`, values)
          if values != null && values.nonEmpty && !values.contains(null) =>
        buckets(values.toSeq)
      case _ => None
    }
    if (sets.isEmpty) None else Some(sets.reduce(_ intersect _))
  }

  /** The parquet dirs a scan must read: all of the snapshot's dirs, or only
    * the pruned buckets' dirs.
    */
  private[graft] def scanDirs(path: String, v: VersionedHub.Version,
      buckets: Option[Set[Int]]): Seq[String] =
    if (v.buckets.isEmpty) Seq(VersionedHub.resolve(path, v.dataDir))
    else {
      val ids = buckets.fold(v.buckets.keys.toSeq.sorted)(bs =>
        bs.toSeq.sorted.filter(v.buckets.contains))
      ids.flatMap(v.buckets.get).map(VersionedHub.resolve(path, _))
    }
}

private[sources] class HubTable(path: String, asOf: Option[Int])
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {

  private def spark = SparkSession.active
  private lazy val v = VersionedHub.versionAt(spark, path, asOf)
  private lazy val fullSchema = VersionedHub.snapshotSchema(spark, path, v)

  override def name(): String =
    s"graft-hub `$path`" + asOf.fold("")(n => s" VERSION AS OF $n")

  override def schema(): StructType = fullSchema

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.V1_BATCH_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new HubScanBuilder(path, v, fullSchema)

  /** WRITE path (`df.write.format("graft-hub").option("path", hub)
    * .option("keys", "k").mode("append").save()`): an "append" lands as one
    * ACID merge-upsert version through [[VersionedHub.write]] — keyed when
    * `keys` is given (comma-separated; a bucketed hub routes through its
    * recorded layout automatically), a plain snapshot append otherwise.
    * Same V1 bridge as the read path ([[org.apache.spark.sql.connector
    * .write.V1Write]] → InsertableRelation, the JDBC-v2 shape). The table
    * must have at least one committed version (schema inference reads the
    * manifest); bootstrap the first commit through the library.
    */
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    require(asOf.isEmpty,
      "cannot write to a time-travel snapshot — drop versionAsOf")
    val keys = Option(info.options.get("keys"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    new org.apache.spark.sql.connector.write.WriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.V1Write {
          override def toInsertableRelation
              : org.apache.spark.sql.sources.InsertableRelation =
            (data: org.apache.spark.sql.DataFrame, overwrite: Boolean) => {
              require(!overwrite,
                "graft-hub writes are merge-upserts; use mode(\"append\")")
              VersionedHub.write(data.sparkSession, data, path, keys)
              ()
            }
        }
    }
  }
}

private[graft] class HubScanBuilder(path: String,
    v: VersionedHub.Version, fullSchema: StructType)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {

  private var required: StructType = fullSchema
  private var pruned: Option[Set[Int]] = None
  private var usedForPruning: Array[Filter] = Array.empty
  private var sawFilters = false
  private var countFromManifest = false

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val spark = SparkSession.active
    sawFilters = filters.nonEmpty
    pruned = HubDataSource.prunedBuckets(spark, fullSchema, v, filters.toSeq)
    usedForPruning =
      if (pruned.isEmpty) Array.empty
      else filters.filter(f =>
        HubDataSource.prunedBuckets(spark, fullSchema, v, Seq(f)).isDefined)
    // dir-level pruning only skips buckets a matching row cannot live in;
    // rows inside surviving buckets still need every predicate — return
    // ALL filters for post-scan evaluation (correctness cannot regress)
    filters
  }

  override def pushedFilters(): Array[Filter] = usedForPruning

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Global `count(*)` with no predicates is answered from the MANIFEST —
    * the commit audit field every version carries — so counting a 100 TB
    * hub snapshot costs zero file I/O. Spark only offers an aggregate for
    * pushdown when every filter was fully handled; this builder always
    * returns filters for post-scan evaluation, so any filtered count
    * automatically takes the row-scan path (semantics can never regress).
    */
  override def pushAggregation(aggregation: Aggregation): Boolean = {
    countFromManifest = !sawFilters &&
      aggregation.groupByExpressions.isEmpty &&
      aggregation.aggregateExpressions.length == 1 &&
      aggregation.aggregateExpressions.head.isInstanceOf[CountStar]
    countFromManifest
  }

  override def supportCompletePushDown(aggregation: Aggregation): Boolean = {
    pushAggregation(aggregation)
    countFromManifest
  }

  override def build(): Scan =
    if (countFromManifest) new HubCountScan(path, v)
    else new HubScan(path, v, fullSchema, required,
      HubDataSource.scanDirs(path, v, pruned))
}

/** The manifest-answered `count(*)` scan: one row, zero file I/O. */
private[sources] class HubCountScan(path: String, v: VersionedHub.Version)
    extends V1Scan {

  private val schemaOut =
    StructType(Seq(org.apache.spark.sql.types.StructField(
      "count(*)", org.apache.spark.sql.types.LongType, nullable = false)))

  override def readSchema(): StructType = schemaOut

  override def description(): String =
    s"graft-hub v${v.version} count-from-manifest rows=${v.rows}"

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T = {
    val desc = description()
    val rows = v.rows
    val relation = new BaseRelation with TableScan {
      override def sqlContext: SQLContext = context
      override def schema: StructType = schemaOut
      override def toString: String = desc
      override def buildScan(): RDD[Row] =
        context.sparkSession.sparkContext.parallelize(Seq(Row(rows)), 1)
    }
    relation.asInstanceOf[T]
  }
}

private[sources] class HubScan(path: String, v: VersionedHub.Version,
    fullSchema: StructType, required: StructType, dirs: Seq[String])
    extends V1Scan with SupportsReportStatistics {

  override def readSchema(): StructType = required

  override def description(): String =
    s"graft-hub v${v.version} dirs=${dirs.size}/${
      if (v.buckets.isEmpty) 1 else v.buckets.size}"

  /** Manifest-backed planning statistics, so Catalyst's join strategy sees
    * the true (pruned) row count instead of a default guess — a
    * bucket-pruned hub side of a join can qualify for broadcast. Row count:
    * the per-bucket manifest audit sums over exactly the scanned dirs;
    * bytes: one filesystem listing per scanned dir (planning-time, bounded
    * by the dir count).
    */
  override def estimateStatistics(): Statistics = {
    val rowsOpt: Option[Long] =
      if (v.buckets.isEmpty) Some(v.rows)
      else if (v.bucketRows.nonEmpty) {
        val scanned = v.buckets.filter { case (_, d) =>
          dirs.contains(VersionedHub.resolve(path, d))
        }.keySet
        Some(scanned.toSeq.flatMap(v.bucketRows.get).sum)
      } else None
    val bytes: Long =
      try {
        val conf = SparkSession.active.sparkContext.hadoopConfiguration
        dirs.map { d =>
          val p = new org.apache.hadoop.fs.Path(d)
          p.getFileSystem(conf).getContentSummary(p).getLength
        }.sum
      } catch { case _: Exception => Long.MaxValue }
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong =
        rowsOpt.fold(java.util.OptionalLong.empty())(
          java.util.OptionalLong.of)
    }
  }

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T = {
    val desc = description()
    val relation = new BaseRelation with TableScan {
      override def sqlContext: SQLContext = context
      override def schema: StructType = required
      // RowDataSourceScan prints the relation's toString — surface the
      // version + dir-pruning evidence there (plan-gated in spec)
      override def toString: String = desc
      override def buildScan(): RDD[Row] = {
        val session = context.sparkSession
        val base =
          // a 0-row snapshot (catalog CREATE TABLE) may hold no part files;
          // parquet cannot scan an empty dir but the manifest has the schema
          if (dirs.isEmpty || v.rows == 0L)
            session.createDataFrame(
              session.sparkContext.emptyRDD[Row], fullSchema)
          else VersionedHub.alignTo(
            session.read.option("mergeSchema", "true").parquet(dirs: _*),
            fullSchema)
        base.select(required.fieldNames.toIndexedSeq.map(col): _*).rdd
      }
    }
    relation.asInstanceOf[T]
  }
}
