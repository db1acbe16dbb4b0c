package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** Delta-dialect maintenance STATEMENTS for graft-hub tables, as a parser
  * extension (registered by [[GraftExtensions]]):
  *
  * {{{
  *   OPTIMIZE cat.db.t [WHERE <pred> | ZORDER BY (a, b)]
  *   VACUUM cat.db.t [RETAIN <n> HOURS] [DRY RUN]
  *   RESTORE [TABLE] cat.db.t TO VERSION AS OF <n>
  *   RESTORE [TABLE] cat.db.t TO TIMESTAMP AS OF '<ts>'
  *   DESCRIBE HISTORY cat.db.t
  *   CONVERT TO HUB cat.db.t    -- Delta's CONVERT TO DELTA analogue
  * }}}
  *
  * Spark's grammar has none of these (Delta ships its own ANTLR extension
  * for exactly this reason); each statement is REWRITTEN to the CALL
  * procedure / metadata-table form the engine already implements and then
  * parsed by the delegate — one semantics, two spellings. The rewrite
  * fires only when the statement's FIRST keyword matches (and `DESCRIBE`
  * only with `HISTORY` after it), so every normal statement takes the
  * zero-cost delegate path; a malformed maintenance statement falls
  * through to Spark's parser, whose PARSE_SYNTAX_ERROR names the bad
  * token.
  *
  * An unqualified table name resolves in the session's CURRENT catalog —
  * the same resolution the statement's SELECT/CALL spelling would get.
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    delegate.parsePlan(
      GraftSqlParser.rewrite(session, delegate, sqlText).getOrElse(sqlText))
  override def parseExpression(s: String): Expression =
    delegate.parseExpression(s)
  override def parseTableIdentifier(s: String): TableIdentifier =
    delegate.parseTableIdentifier(s)
  override def parseFunctionIdentifier(s: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(s)
  override def parseMultipartIdentifier(s: String): Seq[String] =
    delegate.parseMultipartIdentifier(s)
  override def parseQuery(s: String): LogicalPlan = delegate.parseQuery(s)
  override def parseRoutineParam(s: String): StructType =
    delegate.parseRoutineParam(s)
  override def parseDataType(s: String): DataType = delegate.parseDataType(s)
  override def parseTableSchema(s: String): StructType =
    delegate.parseTableSchema(s)
}

object GraftSqlParser {

  // a quoted part admits doubled backticks (the lexer's escape for a
  // literal backtick inside an identifier)
  private val Part = "(?:[\\w$]+|`(?:[^`]|``)+`)"
  private val Id = s"$Part(?:[.]$Part)*"

  private val OptimizeRe =
    ("(?is)^\\s*OPTIMIZE\\s+(" + Id + ")" +
      "(?:\\s+WHERE\\s+(.+?))?" +
      "(?:\\s+ZORDER\\s+BY\\s*\\(\\s*(" + Part + ")\\s*,\\s*(" + Part +
      ")\\s*\\))?\\s*;?\\s*$").r
  private val VacuumRe =
    ("(?is)^\\s*VACUUM\\s+(" + Id + ")" +
      "(?:\\s+RETAIN\\s+(\\d+)\\s+HOURS)?(\\s+DRY\\s+RUN)?\\s*;?\\s*$").r
  private val RestoreVRe =
    ("(?is)^\\s*RESTORE\\s+(?:TABLE\\s+)?(" + Id +
      ")\\s+TO\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)\\s*;?\\s*$").r
  private val RestoreTsRe =
    ("(?is)^\\s*RESTORE\\s+(?:TABLE\\s+)?(" + Id +
      ")\\s+TO\\s+TIMESTAMP\\s+AS\\s+OF\\s+'([^']+)'\\s*;?\\s*$").r
  private val HistoryRe =
    ("(?is)^\\s*DESC(?:RIBE)?\\s+HISTORY\\s+(" + Id + ")\\s*;?\\s*$").r
  private val DetailRe =
    ("(?is)^\\s*DESC(?:RIBE)?\\s+DETAIL\\s+(" + Id + ")\\s*;?\\s*$").r
  private val ConvertRe =
    ("(?is)^\\s*CONVERT\\s+TO\\s+HUB\\s+(" + Id + ")\\s*;?\\s*$").r
  // Delta's CONVERT TO DELTA ... PARTITIONED BY parity; types are
  // inferred from the hive layout, so the declaration carries names only
  private val ConvertPartRe =
    ("(?is)^\\s*CONVERT\\s+TO\\s+HUB\\s+(" + Id +
      ")\\s+PARTITIONED\\s+BY\\s*\\(\\s*(" + Part +
      "(?:\\s*,\\s*" + Part + ")*)\\s*\\)\\s*;?\\s*$").r

  /** Re-quote one identifier part for SQL output (the delegate's
    * multipart parser strips backticks and unescapes doubled ones).
    */
  private def qid(p: String): String =
    if (p.matches("[A-Za-z0-9_]+")) p
    else "`" + p.replace("`", "``") + "`"

  /** (catalog, table-within-catalog) with SPARK'S resolution rule: the
    * leading part names a catalog only if one is REGISTERED under it —
    * otherwise the whole identifier resolves inside the session's current
    * catalog (so `OPTIMIZE default.t` under `USE hubcat` reaches hubcat's
    * table, exactly like the SELECT/CALL spelling would). Splitting uses
    * the delegate's multipart parser (correct backtick/escape handling).
    */
  private def catTable(session: SparkSession, delegate: ParserInterface,
      ident: String): (String, String) = {
    val ps = delegate.parseMultipartIdentifier(ident)
    def isCatalog(name: String): Boolean =
      name == "spark_catalog" ||
        session.conf.getOption(s"spark.sql.catalog.$name").isDefined
    if (ps.length >= 2 && isCatalog(ps.head))
      (ps.head, ps.tail.mkString("."))
    else (session.catalog.currentCatalog(), ps.mkString("."))
  }

  /** Single-quote a string literal by DOUBLING embedded quotes — the one
    * escape Spark's lexer honors in both escape modes. A backslash escape
    * would be read literally under
    * `spark.sql.parser.escapedStringLiterals=true` (a supported conf,
    * common in regex-heavy workloads) and corrupt the rewritten predicate.
    */
  private def q(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Unwrap ONE already-regex-matched identifier part: backtick-quoted
    * parts unescape doubled backticks exactly like Spark's lexer; bare
    * parts pass through verbatim. NOT routed through
    * `parseMultipartIdentifier` — the `Part` charset (`[\w$]`) accepts
    * `$` in bare identifiers, which Spark's PARSER refuses, so the parser
    * route would reject statements these regexes matched (and handled
    * fine before the round-15 quoting hardening).
    */
  private def unquotePart(p: String): String =
    if (p.length >= 2 && p.head == '`' && p.last == '`')
      p.substring(1, p.length - 1).replace("``", "`")
    else p

  private val PartRe = Part.r

  private[graft] def rewrite(session: SparkSession,
      delegate: ParserInterface, sql: String)
      : Option[String] = {
    val head = sql.trim.takeWhile(!_.isWhitespace)
      .toUpperCase(java.util.Locale.ROOT)
    head match {
      case "OPTIMIZE" => sql match {
        case OptimizeRe(ident, where, za, zb) =>
          val (cat, t) = catTable(session, delegate, ident)
          require(where == null || za == null,
            "OPTIMIZE ... WHERE and ZORDER BY are not supported together " +
              "— z-order rewrites whole buckets, a predicate scope would " +
              "be ignored; run them as two statements")
          if (za != null) {
            // unwrap doubled backticks exactly as Spark's lexer would —
            // stripPrefix/stripSuffix would pass `a``b` through literally
            Some(s"CALL ${qid(cat)}.system.zorder(`table` => ${q(t)}, " +
              s"col_a => ${q(unquotePart(za))}, " +
              s"col_b => ${q(unquotePart(zb))})")
          }
          else if (where != null)
            Some(s"CALL ${qid(cat)}.system.optimize(`table` => ${q(t)}, " +
              s"where => ${q(where.trim)})")
          else Some(s"CALL ${qid(cat)}.system.optimize(`table` => ${q(t)})")
        case _ => None
      }
      case "VACUUM" => sql match {
        case VacuumRe(ident, hours, dry) =>
          val (cat, t) = catTable(session, delegate, ident)
          val retain = Option(hours)
            .map(h => s", retain_ms => ${h.toLong * 3600000L}L")
            .getOrElse("")
          val dryRun =
            if (dry != null) ", dry_run => true" else ""
          Some(s"CALL ${qid(cat)}.system.vacuum(`table` => ${q(t)}$retain$dryRun)")
        case _ => None
      }
      case "RESTORE" => sql match {
        case RestoreVRe(ident, v) =>
          val (cat, t) = catTable(session, delegate, ident)
          Some(s"CALL ${qid(cat)}.system.restore(`table` => ${q(t)}, version => $v)")
        case RestoreTsRe(ident, ts) =>
          val (cat, t) = catTable(session, delegate, ident)
          Some(s"CALL ${qid(cat)}.system.restore(`table` => ${q(t)}, " +
            s"timestamp => ${q(ts)})")
        case _ => None
      }
      case "CONVERT" => sql match {
        case ConvertPartRe(ident, cols) =>
          val (cat, t) = catTable(session, delegate, ident)
          // tokenize with the SAME Part pattern the statement regex
          // matched (a naive split(",") would cut inside a backticked
          // name containing a comma), then unwrap doubled backticks
          val names = PartRe.findAllIn(cols).toSeq.map(unquotePart)
          // the procedure channel is a comma-joined string — a name
          // carrying a comma cannot survive it; refuse loudly instead of
          // silently mis-splitting downstream
          require(names.forall(!_.contains(",")),
            "partition column names containing ',' are not supported by " +
              "CONVERT TO HUB ... PARTITIONED BY")
          Some(s"CALL ${qid(cat)}.system.convert_partitioned(" +
            s"`table` => ${q(t)}, cols => ${q(names.mkString(","))})")
        case ConvertRe(ident) =>
          val (cat, t) = catTable(session, delegate, ident)
          Some(s"CALL ${qid(cat)}.system.convert(`table` => ${q(t)})")
        case _ => None
      }
      case "DESC" | "DESCRIBE" => sql match {
        case HistoryRe(ident) =>
          val ps = delegate.parseMultipartIdentifier(ident)
          val hist = (ps.init.map(qid) :+
            qid(ps.last + "$history")).mkString(".")
          Some(s"SELECT * FROM $hist ORDER BY version DESC")
        case DetailRe(ident) =>
          val ps = delegate.parseMultipartIdentifier(ident)
          val det = (ps.init.map(qid) :+
            qid(ps.last + "$detail")).mkString(".")
          Some(s"SELECT * FROM $det")
        case _ => None
      }
      case _ => None
    }
  }
}
