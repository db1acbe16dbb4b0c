package graft.sources

import graft.writers.VersionedHub

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{DataTypes, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The hub's SQL maintenance surface — Iceberg-style stored procedures
  * over the DSv2 [[org.apache.spark.sql.connector.catalog
  * .ProcedureCatalog]] API (Spark 4.1, SPIP SPARK-44167):
  *
  * {{{
  *   CALL hub.system.vacuum(`table` => 'db.t', keep_versions => 4)
  *   CALL hub.system.optimize(`table` => 't')          -- layout-aware
  *   CALL hub.system.zorder(`table` => 't', col_a => 'a', col_b => 'b')
  *   CALL hub.system.restore(`table` => 't', version => 3)
  *   CALL hub.system.repair(`table` => 't', min_age_ms => 0)
  *   CALL hub.system.clone(`table` => 't', target => 't2')  -- shallow, zero-copy
  *   CALL hub.system.bloom_index(`table` => 't', cols => 'a,b')  -- parquet blooms
  * }}}
  *
  * Each procedure is the SQL face of the corresponding [[VersionedHub]]
  * operation (OPTIMIZE/VACUUM/RESTORE in Delta's SQL dialect are
  * parser-level extensions Spark has no grammar for; `CALL` is the
  * in-tree route). `optimize` dispatches on the recorded layout: bucketed
  * hubs compact per bucket (structural sharing), flat hubs rewrite to
  * target-sized files.
  */
private[sources] object HubProcedures {

  private def spark = SparkSession.active

  /** A one-row driver-local result: the LocalScan shape the planner turns
    * into a LocalTableScanExec — no job, no files.
    */
  private final class OneRow(schema: StructType, values: Seq[Any])
      extends LocalScan {
    override def rows(): Array[InternalRow] =
      Array(InternalRow.fromSeq(values.map {
        case s: String => UTF8String.fromString(s)
        case other => other
      }))
    override def readSchema(): StructType = schema
  }

  private final case class Proc(
      procName: String,
      params: Array[ProcedureParameter],
      outSchema: StructType)(body: InternalRow => Seq[Any])
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = s"graft-hub $procName"
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow): java.util.Iterator[Scan] =
      java.util.List.of[Scan](new OneRow(outSchema, body(input))).iterator()
  }

  private def p(name: String, dt: org.apache.spark.sql.types.DataType,
      default: Option[String] = None): ProcedureParameter = {
    val b = ProcedureParameter.in(name, dt)
    default.foreach(b.defaultValue)
    b.build()
  }

  private val versionOut = new StructType().add("version", DataTypes.IntegerType)

  def load(catalog: HubCatalog, ident: Identifier): UnboundProcedure = {
    require(ident.namespace().sameElements(Array("system")),
      s"hub procedures live in the 'system' namespace, got $ident")
    def tablePath(input: InternalRow): String = {
      val t = input.getUTF8String(0)
      require(t != null, "table is required")
      catalog.tablePathOf(t.toString)
    }
    ident.name() match {
      case "vacuum" => Proc("vacuum",
        Array(p("table", DataTypes.StringType),
          p("keep_versions", DataTypes.IntegerType, Some("-1")),
          p("retain_ms", DataTypes.LongType,
            Some(VersionedHub.DefaultVacuumRetainMs.toString)),
          p("dry_run", DataTypes.BooleanType, Some("false"))),
        new StructType().add("kept_versions", DataTypes.IntegerType)
          .add("dropped_versions", DataTypes.IntegerType)
          .add("swept_data_roots", DataTypes.IntegerType)) { in =>
        val path = tablePath(in)
        val keep = Some(in.getInt(1)).filter(_ >= 1)
        val (droppedV, sweptRoots) =
          if (in.getBoolean(3))
            VersionedHub.vacuumDryRun(spark, path, keep, in.getLong(2))
          else VersionedHub.vacuum(spark, path, keep, in.getLong(2))
        // kept_versions is the same number either way: the dry run
        // PREDICTS what the real vacuum would leave behind
        Seq(VersionedHub.history(spark, path).size - (if (in.getBoolean(3))
          droppedV.size else 0), droppedV.size, sweptRoots.size)
      }
      case "optimize" => Proc("optimize",
        Array(p("table", DataTypes.StringType),
          p("target_file_rows", DataTypes.LongType, Some((1024L * 1024).toString)),
          // comma-separated bucket ids: compact ONLY these (a targeted
          // maintenance pass over the hot buckets instead of O(table));
          // bucketed hubs only
          p("buckets", DataTypes.StringType, Some("''")),
          // OPTIMIZE ... WHERE '<pred>' (Delta parity): compact only the
          // buckets the predicate can touch, resolved from the manifest's
          // per-file stats + bucket hashing — the SAME candidate logic
          // DELETE/UPDATE use, so "compact what I just churned" needs no
          // bucket-id arithmetic from the caller; bucketed hubs only
          p("where", DataTypes.StringType, Some("''"))),
        versionOut) { in =>
        val path = tablePath(in)
        val bucketed = VersionedHub.history(spark, path)
          .lastOption.exists(_.nBuckets.isDefined)
        val chosen = Option(in.getUTF8String(2)).map(_.toString.trim)
          .filter(_.nonEmpty)
          .map(_.split(",").map(_.trim.toInt).toSeq)
        require(chosen.isEmpty || bucketed,
          s"buckets => ... targets a BUCKETED hub; $path is flat")
        val whereSql = Option(in.getUTF8String(3)).map(_.toString.trim)
          .filter(_.nonEmpty)
        require(chosen.isEmpty || whereSql.isEmpty,
          "optimize takes buckets => ... OR where => ..., not both")
        require(whereSql.isEmpty || bucketed,
          s"where => ... targets a BUCKETED hub; $path is flat")
        val byWhere: Option[Seq[Int]] = whereSql.map { sql =>
          // resolve the predicate against the tip snapshot (one
          // plan-only pass, no job) — the OPTIMIZED plan so literal casts
          // are folded (`k = 7` → a bigint literal the DSv1 translator
          // accepts), falling back to the analyzed plan if the optimizer
          // collapsed the Filter node away
          val qe = VersionedHub.read(spark, path)
            .filter(org.apache.spark.sql.functions.expr(sql))
            .queryExecution
          val cond = qe.optimizedPlan.collectFirst {
              case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
                f.condition
            }.orElse(qe.analyzed.collectFirst {
              case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
                f.condition
            }).getOrElse(throw new IllegalArgumentException(
              s"where => '$sql' did not analyze to a filter"))
          // untranslatable conjuncts only WIDEN the candidate set (the
          // DELETE/UPDATE contract): a predicate with no pruning power
          // degrades soundly to a full compaction, never to a miss
          val filters = PredicateHelperObj.splitConjunctivePredicates(cond)
            .flatMap(org.apache.spark.sql.graftbridge.FilterBridge.translate)
          val tip = VersionedHub.versionAt(spark, path, None)
          HubDataSource.rowLevelCandidates(spark, path, filters)
            .map(_(tip).toSeq.sorted)
            .getOrElse(tip.buckets.keys.toSeq.sorted)
        }
        Seq(if (bucketed)
              VersionedHub.compactBuckets(spark, path, chosen.orElse(byWhere))
            else VersionedHub.optimize(spark, path, in.getLong(1)))
      }
      case "zorder" => Proc("zorder",
        Array(p("table", DataTypes.StringType),
          p("col_a", DataTypes.StringType), p("col_b", DataTypes.StringType),
          p("files_per_bucket", DataTypes.IntegerType, Some("4"))),
        versionOut) { in =>
        // layout-aware like `optimize`: bucketed hubs z-order per bucket
        // (file skipping on non-routing columns inside every dir), flat
        // hubs rewrite the snapshot along the curve
        val path = tablePath(in)
        val bucketed = VersionedHub.history(spark, path)
          .lastOption.exists(_.nBuckets.isDefined)
        Seq(if (bucketed)
            VersionedHub.optimizeZOrderBuckets(spark, path,
              in.getUTF8String(1).toString, in.getUTF8String(2).toString,
              in.getInt(3))
          else VersionedHub.optimizeZOrder(spark, path,
            in.getUTF8String(1).toString, in.getUTF8String(2).toString))
      }
      case "restore" => Proc("restore",
        Array(p("table", DataTypes.StringType),
          // one of the two: a version number, or a timestamp (epoch ms /
          // yyyy-MM-dd / session-zone timestamp — Delta's RESTORE ... TO
          // TIMESTAMP AS OF) resolved to the latest commit at-or-before
          p("version", DataTypes.IntegerType, Some("-1")),
          p("timestamp", DataTypes.StringType, Some("''"))),
        versionOut) { in =>
        val path = tablePath(in)
        // isNullAt disambiguates a NULL arg (absent → the -1 default) from
        // an EXPLICIT 0, which InternalRow.getInt would otherwise unbox
        // identically; versions start at 1, so explicit 0/negative is
        // refused rather than silently treated as absent
        val vArg = if (in.isNullAt(1)) -1 else in.getInt(1)
        require(vArg == -1 || vArg >= 1,
          s"version must be >= 1 (or omitted), got $vArg")
        val byV = Some(vArg).filter(_ >= 1)
        val byTs = Option(in.getUTF8String(2)).map(_.toString.trim)
          .filter(_.nonEmpty)
        require(byV.isEmpty != byTs.isEmpty,
          "restore needs exactly one of version => N, timestamp => '...'")
        // one resolution rule for every time-travel surface (reader
        // options, SQL literals, and this procedure)
        val v = HubDataSource.asOfVersion(spark, path,
          new org.apache.spark.sql.util.CaseInsensitiveStringMap(
            byV.map(n => java.util.Map.of("versionAsOf", n.toString))
              .getOrElse(java.util.Map.of("timestampAsOf", byTs.get)))).get
        Seq(VersionedHub.restore(spark, path, v))
      }
      case "clone" => Proc("clone",
        Array(p("table", DataTypes.StringType),
          p("target", DataTypes.StringType),
          // CLONE ... VERSION AS OF: clone a historical snapshot
          p("version", DataTypes.IntegerType, Some("-1"))),
        versionOut) { in =>
        val target = in.getUTF8String(1)
        require(target != null, "target is required")
        // an EXPLICIT version 0 / negative must fail, not clone the tip;
        // isNullAt separates NULL (absent → -1 default → tip) from the
        // explicit 0 that InternalRow.getInt would unbox identically
        val vArg = if (in.isNullAt(2)) -1 else in.getInt(2)
        require(vArg == -1 || vArg >= 1,
          s"version must be >= 1 (or omitted for the tip), got $vArg")
        Seq(VersionedHub.cloneTable(spark, tablePath(in),
          catalog.tablePathOf(target.toString),
          Some(vArg).filter(_ >= 1)))
      }
      case "bloom_index" => Proc("bloom_index",
        Array(p("table", DataTypes.StringType),
          p("cols", DataTypes.StringType),
          p("enable", DataTypes.BooleanType, Some("true"))),
        versionOut) { in =>
        val colsArg = in.getUTF8String(1)
        require(colsArg != null, "cols is required")
        val cols = colsArg.toString.split(",").map(_.trim)
          .filter(_.nonEmpty).toSeq
        require(cols.nonEmpty, "cols must name at least one column")
        Seq(VersionedHub.alterSchema(spark, tablePath(in),
          graft.writers.BloomIndex.flag(_, cols, in.getBoolean(2))))
      }
      case "purge" => Proc("purge",
        Array(p("table", DataTypes.StringType)),
        versionOut) { in =>
        Seq(VersionedHub.purge(spark, tablePath(in)))
      }
      case "convert" => Proc("convert",
        Array(p("table", DataTypes.StringType)),
        versionOut) { in =>
        Seq(VersionedHub.convert(spark, tablePath(in)))
      }
      case "convert_partitioned" => Proc("convert_partitioned",
        Array(p("table", DataTypes.StringType),
          p("cols", DataTypes.StringType)),
        versionOut) { in =>
        val colsArg = in.getUTF8String(1)
        require(colsArg != null, "cols is required")
        val cols = colsArg.toString.split(",").map(_.trim)
          .filter(_.nonEmpty).toSeq
        require(cols.nonEmpty, "cols must name at least one column")
        Seq(VersionedHub.convertPartitioned(spark, tablePath(in),
          expectCols = Some(cols)))
      }
      case "repair" => Proc("repair",
        Array(p("table", DataTypes.StringType),
          p("min_age_ms", DataTypes.LongType, Some("600000"))),
        new StructType().add("reclaimed", DataTypes.IntegerType)) { in =>
        Seq(VersionedHub.repair(spark, tablePath(in), in.getLong(1)).size)
      }
      case other => throw new IllegalArgumentException(
        s"unknown hub procedure system.$other — known: ${ProcedureNames.mkString(", ")}")
    }
  }

  val ProcedureNames: Seq[String] =
    Seq("vacuum", "optimize", "zorder", "restore", "repair", "clone",
      "bloom_index", "purge", "convert", "convert_partitioned")
}
