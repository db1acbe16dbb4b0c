package graft.writers

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.column.statistics.Statistics
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType}
import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String

/** Per-FILE column statistics for the hub commit manifest — the Delta-style
  * data-skipping record (Armbrust et al., VLDB 2020 §4.1: per-file min/max
  * in the transaction log). Every commit reads the footers of the files it
  * just wrote — the same footer pass that already audits row counts — and
  * records `{rows, bytes, per-column min/max/nullCount}` per file, so a
  * later scan can skip whole files from the MANIFEST alone: no file I/O,
  * no filesystem listing, at planning time.
  *
  * Value space is deliberately tiny — `Long | Double | String | Boolean` —
  * covering Spark's atomic types (dates as epoch days, timestamps as epoch
  * micros, integrals widened to Long, Float to Double). A column whose
  * physical type falls outside it (decimal, binary, nested) simply records
  * no stat and never prunes. String ordering is UTF-8 byte-wise unsigned —
  * exactly Spark's `UTF8String` comparison AND parquet's BINARY sort
  * order, so a string range check means the same thing in the engine, in
  * the footer, and here.
  */
object FileStats {

  /** `None` anywhere = unknown = never prune on it. */
  final case class ColStat(
      min: Option[Any], max: Option[Any], nullCount: Option[Long])

  final case class FileStat(rows: Long, bytes: Long,
      cols: Map[String, ColStat]) {
    /** All `rows` of this file are null in `c` (provably no non-null value). */
    def allNull(c: String): Boolean =
      rows > 0 && cols.get(c).exists(_.nullCount.contains(rows))
  }

  /** Stats are recorded for at most this many leading top-level columns
    * (Delta's `dataSkippingNumIndexedCols` default) — bounds manifest size
    * on very wide tables.
    */
  val MaxIndexedCols = 32

  /** ≤ this many files: footers are read serially on the driver (zero Spark
    * jobs — the high-frequency small-commit case); more: ONE job over the
    * file list, footers opened on executors.
    */
  private val DriverFooterBudget = 64

  /** Stats for every parquet file under `dir`, keyed by path relative to
    * `tableRoot` (the manifest's path space). Cost: one footer read per
    * file — metadata only, no data pages.
    */
  def collect(spark: SparkSession, fs: FileSystem, tableRoot: Path,
      dir: Path, mustIndex: Set[String] = Set.empty): Map[String, FileStat] = {
    if (!fs.exists(dir)) return Map.empty
    val rootStr = fs.makeQualified(tableRoot).toString
    val it = fs.listFiles(dir, /* recursive = */ true)
    val files = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    while (it.hasNext) {
      val st = it.next()
      if (st.getPath.getName.endsWith(".parquet"))
        files += ((st.getPath.toString, st.getLen))
    }
    def rel(abs: String): String = {
      val s = abs.stripPrefix(rootStr).stripPrefix("/")
      require(s != abs, s"file $abs is not under table root $rootStr")
      s
    }
    if (files.length <= DriverFooterBudget) {
      val conf = fs.getConf
      files.map { case (p, len) =>
        rel(p) -> ofFile(p, len, conf, mustIndex) }.toMap
    } else {
      // executor-side footer reads resolve the absolute URIs (scheme +
      // authority travel in the path string) with the DRIVER's hadoop conf,
      // broadcast once per commit: a bare `new Configuration()` would drop
      // every `spark.hadoop.*` override and custom filesystem registration
      // — the exact settings an object-store deployment needs to open its
      // own files
      val bcConf = spark.sparkContext.broadcast(
        new org.apache.spark.util.SerializableConfiguration(fs.getConf))
      try spark.sparkContext
        .parallelize(files.toSeq, math.max(1, math.min(files.length, 64)))
        .map { case (p, len) =>
          p -> ofFile(p, len, bcConf.value.value, mustIndex) }
        .collect().map { case (p, st) => rel(p) -> st }.toMap
      finally bcConf.destroy()
    }
  }

  /** One file's stats from its footer. Never throws on odd content — a
    * column that cannot be summarized just records no stat.
    */
  private def ofFile(pathStr: String, bytes: Long,
      conf: Configuration, mustIndex: Set[String] = Set.empty): FileStat = {
    val fr = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(pathStr), conf))
    try {
      val md = fr.getFooter
      val rows = fr.getRecordCount
      // mustIndex columns (identity high-water recovery depends on their
      // min/max) are indexed regardless of the width cap
      val indexed: Set[String] = md.getFileMetaData.getSchema.getFields
        .asScala.take(MaxIndexedCols).map(_.getName).toSet ++ mustIndex
      // accumulator: min, max, nullCount, valuesPoisoned, nullsPoisoned
      final case class Acc(min: Option[Any], max: Option[Any],
          nulls: Long, vBad: Boolean, nBad: Boolean)
      val acc = scala.collection.mutable.LinkedHashMap.empty[String, Acc]
      for (b <- md.getBlocks.asScala; cc <- b.getColumns.asScala) {
        val segs = cc.getPath.iterator.asScala.toList
        if (segs.length == 1 && indexed.contains(segs.head)) {
          val name = segs.head
          val a = acc.getOrElse(name, Acc(None, None, 0L, vBad = false, nBad = false))
          val st: Statistics[_] = cc.getStatistics
          val blockRows = b.getRowCount
          val next =
            if (st == null || st.isEmpty) a.copy(vBad = true, nBad = true)
            else {
              val nOk = st.isNumNullsSet && st.getNumNulls >= 0
              val withNulls =
                if (nOk) a.copy(nulls = a.nulls + st.getNumNulls)
                else a.copy(nBad = true)
              if (st.hasNonNullValue) {
                (convert(cc.getPrimitiveType, st.genericGetMin),
                  convert(cc.getPrimitiveType, st.genericGetMax)) match {
                  case (Some(mn), Some(mx)) => withNulls.copy(
                    min = Some(withNulls.min.fold(mn)(m => if (compare(mn, m) < 0) mn else m)),
                    max = Some(withNulls.max.fold(mx)(m => if (compare(mx, m) > 0) mx else m)))
                  case _ => withNulls.copy(vBad = true)
                }
              } else if (nOk && st.getNumNulls == blockRows) withNulls // all-null block
              else withNulls.copy(vBad = true) // values dropped by the writer
            }
          acc(name) = next
        }
      }
      val cols = acc.map { case (name, a) =>
        name -> ColStat(
          if (a.vBad) None else a.min.flatMap(widenZero(_, isMin = true)),
          if (a.vBad) None else a.max.flatMap(widenZero(_, isMin = false)),
          if (a.nBad) None else Some(a.nulls))
      }.toMap
      FileStat(rows, bytes, cols)
    } finally fr.close()
  }

  /** Longest string bound recorded verbatim; longer values are truncated
    * to a still-valid bound so a TEXT column cannot bloat the manifest
    * with whole documents.
    */
  val MaxStringBound = 64

  /** Parquet writers are historically sloppy about the sign of floating
    * zero in min/max; widen ±0.0 bounds to the safe side so `= 0.0`
    * pruning can never skip a file holding the other zero. Long strings
    * are WIDENED-truncated: a min prefix is ≤ the true min (valid lower
    * bound); a max prefix gets its last incrementable char bumped and the
    * tail dropped (parquet's own truncator trick — strictly > everything
    * the true max prefixes), or None when nothing can be bumped.
    */
  private def widenZero(v: Any, isMin: Boolean): Option[Any] = v match {
    case d: Double if d == 0.0d => Some(if (isMin) -0.0d else 0.0d)
    case s: String if s.length > MaxStringBound =>
      if (isMin) Some(s.substring(0, MaxStringBound))
      else {
        // rightmost char below the surrogate range can be incremented while
        // preserving UTF-8 byte order (our comparison space)
        val prefix = s.substring(0, MaxStringBound).toCharArray
        var i = prefix.length - 1
        while (i >= 0 && prefix(i) >= 0xD7FF.toChar) i -= 1
        if (i < 0) None
        else {
          prefix(i) = (prefix(i) + 1).toChar
          Some(new String(prefix, 0, i + 1))
        }
      }
    case other => Some(other)
  }

  /** Physical+logical parquet type → the manifest value space. None =
    * unsupported, poison the column (never prune).
    */
  private def convert(pt: PrimitiveType, v: Any): Option[Any] = {
    import PrimitiveType.PrimitiveTypeName._
    val lt = pt.getLogicalTypeAnnotation
    pt.getPrimitiveTypeName match {
      case BOOLEAN => Some(v.asInstanceOf[java.lang.Boolean].booleanValue())
      case INT32 => lt match {
        case null => Some(v.asInstanceOf[java.lang.Integer].longValue())
        case _: LogicalTypeAnnotation.DateLogicalTypeAnnotation =>
          Some(v.asInstanceOf[java.lang.Integer].longValue())
        case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation if i.isSigned =>
          Some(v.asInstanceOf[java.lang.Integer].longValue())
        case _ => None
      }
      case INT64 => lt match {
        case null => Some(v.asInstanceOf[java.lang.Long].longValue())
        case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation
            if i.isSigned && i.getBitWidth == 64 =>
          Some(v.asInstanceOf[java.lang.Long].longValue())
        case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
          val raw = v.asInstanceOf[java.lang.Long].longValue()
          t.getUnit match {
            case LogicalTypeAnnotation.TimeUnit.MICROS => Some(raw)
            case LogicalTypeAnnotation.TimeUnit.MILLIS =>
              try Some(Math.multiplyExact(raw, 1000L))
              catch { case _: ArithmeticException => None }
            case _ => None
          }
        case _ => None
      }
      case FLOAT =>
        val f = v.asInstanceOf[java.lang.Float].floatValue()
        if (f.isNaN) None else Some(f.toDouble)
      case DOUBLE =>
        val d = v.asInstanceOf[java.lang.Double].doubleValue()
        if (d.isNaN) None else Some(d)
      case BINARY => lt match {
        case _: LogicalTypeAnnotation.StringLogicalTypeAnnotation =>
          Some(v.asInstanceOf[org.apache.parquet.io.api.Binary]
            .toStringUsingUTF8)
        case _ => None
      }
      case _ => None
    }
  }

  /** Total order within one value-space class. Caller guarantees both sides
    * share a class ([[compareOpt]] guards the mixed case).
    */
  private[writers] def compare(a: Any, b: Any): Int = (a, b) match {
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    case (x: Double, y: Double) => java.lang.Double.compare(x, y)
    case (x: String, y: String) =>
      UTF8String.fromString(x).compareTo(UTF8String.fromString(y))
    case (x: Boolean, y: Boolean) => java.lang.Boolean.compare(x, y)
    case _ => throw new IllegalArgumentException(
      s"incomparable stat classes: ${a.getClass} vs ${b.getClass}")
  }

  /** None when the two sides live in different value-space classes (e.g. a
    * column widened Long→Double across file generations — a lossy promote
    * above 2^53 could prune wrongly, so we refuse to compare instead).
    */
  private[graft] def compareOpt(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: Long, y: Long) => Some(java.lang.Long.compare(x, y))
    case (x: Double, y: Double) => Some(java.lang.Double.compare(x, y))
    case (x: String, y: String) =>
      Some(UTF8String.fromString(x).compareTo(UTF8String.fromString(y)))
    case (x: Boolean, y: Boolean) => Some(java.lang.Boolean.compare(x, y))
    case _ => None
  }

  // ---------- manifest scalar encoding ----------
  // Min/max travel through the manifest as TAGGED STRINGS ("L:9", "D:1.5",
  // "S:abc", "B:true") rather than bare JSON scalars: the manifest parser
  // is a YAML safe-loader, and YAML's scalar resolution would silently
  // reclassify values JSON considers unambiguous ("1.0E10" parses as a
  // string, Infinity has no JSON form at all). A tag prefix makes the
  // round-trip total and type-exact.

  private[graft] def encodeScalar(v: Any): String = v match {
    case l: Long => s"L:$l"
    case d: Double => s"D:$d" // Double.toString → parseDouble is exact
    case s: String => s"S:$s"
    case b: Boolean => s"B:$b"
    case other => throw new IllegalArgumentException(
      s"unencodable stat value class ${other.getClass}")
  }

  private[graft] def decodeScalar(s: String): Option[Any] =
    if (s.length < 2 || s.charAt(1) != ':') None
    else try s.charAt(0) match {
      case 'L' => Some(java.lang.Long.parseLong(s.substring(2)))
      case 'D' => Some(java.lang.Double.parseDouble(s.substring(2)))
      case 'S' => Some(s.substring(2))
      case 'B' => Some(java.lang.Boolean.parseBoolean(s.substring(2)))
      case _ => None
    } catch { case _: NumberFormatException => None }
}
