package graft.engine

import java.time.{LocalDate, ZoneOffset}

import graft.catalog.{Source, SourceSystem, YamlCatalog}
import graft.conf.EngineConfig
import graft.readers.Readers
import graft.transform.Transform
import graft.writers.{HubWriter, RawWriter}

import org.apache.log4j.Logger
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The per-source ingestion pipeline, mirroring the reference's
  * `framework.run` (metadata_ingestion/src/ingestion_framework/
  * framework.py:13-40): load catalog → build config → for each enabled
  * source: read → stamp audit columns → write RAW → transform → write HUB.
  *
  * Differences from the reference, by design:
  *   - native JVM (no Py4J hop per DataFrame call);
  *   - sources may be processed concurrently (`parallelism > 1`): each
  *     source's pipeline is independent driver-side work, and overlapping
  *     them keeps the cluster busy during per-source skew. The reference is
  *     strictly sequential (framework.py:18).
  */
object Ingest {

  private val log = Logger.getLogger(getClass)

  final case class SourceResult(id: String, rawPath: String, hubPath: String)

  def run(
      spark: SparkSession,
      sourcesYaml: String,
      env: Option[String] = None,
      parallelism: Int = 1
  ): Seq[SourceResult] =
    runCatalog(spark, YamlCatalog.load(sourcesYaml), env, parallelism)

  def runCatalog(
      spark: SparkSession,
      system: SourceSystem,
      env: Option[String] = None,
      parallelism: Int = 1
  ): Seq[SourceResult] = {
    val cfg = EngineConfig.fromDefaults(system.defaults, env)
    val enabled = system.sources.filter(_.enabled)
    log.info(s"ingest: ${enabled.size}/${system.sources.size} sources enabled (env=${cfg.env})")
    if (parallelism <= 1) enabled.map(runSource(spark, cfg, _))
    else {
      import java.util.concurrent.Executors
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val pool = Executors.newFixedThreadPool(parallelism)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      try Await.result(
        Future.sequence(enabled.map(s => Future(runSource(spark, cfg, s)))),
        Duration.Inf
      )
      finally pool.shutdown()
    }
  }

  def runSource(spark: SparkSession, cfg: EngineConfig, s: Source): SourceResult = {
    log.info(s"[${s.id}] reading type=${s.`type`}")
    val df = Readers.get(s.`type`)(spark, s.options)
    val stamped = stampAudit(df, s.id)
    val rawPath = s"${cfg.rawBase}/${s.domain}/${s.entity}"
    log.info(s"[${s.id}] writing RAW → $rawPath")
    RawWriter.write(stamped, rawPath, s.rawPartitions)
    val hubDf = Transform.toHub(stamped, s)
    val hubPath = s"${cfg.hubBase}/${s.domain}/${s.entity}"
    log.info(s"[${s.id}] writing HUB → $hubPath (keys=${s.hubPrimaryKeys.mkString(",")})")
    s.hubBuckets match {
      case Some(b) if s.hubPrimaryKeys.nonEmpty =>
        HubWriter.writeBucketed(spark, hubDf, hubPath, s.hubPrimaryKeys, b)
      case _ =>
        HubWriter.write(spark, hubDf, hubPath, s.hubPrimaryKeys)
    }
    SourceResult(s.id, rawPath, hubPath)
  }

  /** Audit-column stamp (framework.py:27-32): `_source_id` literal,
    * `_ingest_ts_utc` per-row current_timestamp, and `ingest_date` as ONE
    * ISO-date string literal per source run, computed driver-side — the whole
    * run lands in a single RAW partition, exactly like the reference.
    */
  def stampAudit(
      df: DataFrame,
      sourceId: String,
      runDate: LocalDate = LocalDate.now(ZoneOffset.UTC)
  ): DataFrame =
    df.withColumn("_source_id", lit(sourceId))
      .withColumn("_ingest_ts_utc", current_timestamp())
      .withColumn("ingest_date", lit(runDate.toString))
}
