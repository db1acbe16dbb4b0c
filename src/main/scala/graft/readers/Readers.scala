package graft.readers

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pluggable reader registry.
  *
  * Reproduces the reference's reader surface
  * (metadata_ingestion/src/ingestion_framework/readers/base_reader.py:4-55):
  * csv / json / parquet / jdbc / olap-with-CSV-fallback, dispatched by the
  * catalog `type` string; unknown types raise with the same message shape.
  *
  * Each reader is `(SparkSession, options) => DataFrame`; `path` (or the
  * jdbc/olap-specific keys) are consumed from the options map and the rest is
  * passed verbatim to Spark's DataFrameReader — same contract as the
  * reference, minus its accidental caller-visible mutation of the dict.
  */
object Readers {

  type Reader = (SparkSession, Map[String, String]) => DataFrame

  /** base_reader.py:4-6 */
  val csv: Reader = (spark, opts) => {
    val (path, rest) = popPath(opts)
    spark.read.options(rest).csv(path)
  }

  /** base_reader.py:8-10 (JSON Lines; `multiline` comes through options) */
  val json: Reader = (spark, opts) => {
    val (path, rest) = popPath(opts)
    spark.read.options(rest).json(path)
  }

  /** base_reader.py:12-14 */
  val parquet: Reader = (spark, opts) => {
    val (path, rest) = popPath(opts)
    spark.read.options(rest).parquet(path)
  }

  /** ORC — extension beyond the reference's reader set (same pluggable
    * contract); columnar like parquet, so pushdown/pruning apply unchanged.
    */
  val orc: Reader = (spark, opts) => {
    val (path, rest) = popPath(opts)
    spark.read.options(rest).orc(path)
  }

  /** Line-oriented text: one string column `value` per line (`wholetext=true`
    * in options flips to one row per file) — the raw-corpus on-ramp.
    */
  val text: Reader = (spark, opts) => {
    val (path, rest) = popPath(opts)
    spark.read.options(rest).text(path)
  }

  /** Opaque binary ingestion (`binaryFile` source): (path, modificationTime,
    * length, content) per file — the multimodal on-ramp that feeds
    * [[graft.operators.Multimodal]]'s typed-metadata schema. Supports
    * `pathGlobFilter` (e.g. `*.png`) via options. Read-side only (Spark has
    * no binaryFile writer); bytes land in a `binary` column and travel
    * through parquet from there on.
    */
  val binaryFile: Reader = (spark, opts) => {
    val (path, rest) = popPath(opts)
    spark.read.options(rest).format("binaryFile").load(path)
  }

  /** base_reader.py:16-29 — url + dbtable required; driver/user/password only
    * set when non-empty (the reference guards with `if truthy`).
    *
    * Extension beyond the reference's 5-key surface: every OTHER option is
    * passed verbatim to Spark's JDBC source, so a large table can be read in
    * parallel slices (`partitionColumn`/`lowerBound`/`upperBound`/
    * `numPartitions`) with a tuned `fetchsize` — without that a 100 TB-era
    * source table funnels through one executor connection. The truthy guard
    * stays authoritative for the credential trio: empty driver/user/password
    * are dropped, never forwarded.
    */
  val jdbc: Reader = (spark, opts) => {
    val url = required(opts, "url", "jdbc")
    val dbtable = required(opts, "dbtable", "jdbc")
    var r = spark.read.format("jdbc").option("url", url).option("dbtable", dbtable)
    // DataFrameReader/JDBCOptions treat option keys case-insensitively, so
    // BOTH the credential lookup and the consumed-set filter must too —
    // a lookup that only matched exact-lowercase would silently DROP a
    // "Driver"/"User"/"Password" spelling (the filter below consumes it),
    // and an exact-case filter would let "User" -> "" bypass the truthy
    // guard or "Url" override the required url
    def lc(k: String): String = k.toLowerCase(java.util.Locale.ROOT)
    for (k <- Seq("driver", "user", "password")) {
      // deterministic under case-variant duplicates: differing variant
      // VALUES are refused loudly whether or not an exact-lowercase
      // spelling is among them — "password" + "Password" with different
      // values is the same ambiguity either way (a collectFirst, or
      // letting the lowercase key silently win, would forward one of two
      // contradictory credentials)
      val variants = opts.collect { case (ok, ov) if lc(ok) == k => ov }.toSeq
      require(variants.distinct.size <= 1,
        s"conflicting case-variant '$k' options with different values " +
          "— spell the credential once")
      val picked = opts.get(k).orElse(variants.headOption)
      for (v <- picked if v.nonEmpty) r = r.option(k, v)
    }
    val consumed = Set("url", "dbtable", "driver", "user", "password")
    r = r.options(opts.view.filterKeys(k => !consumed.contains(lc(k))).toMap)
    r.load()
  }

  /** base_reader.py:31-42 — the XMLA/MDX branch is permanently unavailable in
    * the reference (it unconditionally raises before any network call) and the
    * operative behavior is the CSV fallback read with `header=true` only, so
    * all columns land as strings. We keep that exact contract.
    */
  val olap: Reader = (spark, opts) => {
    val attempt = Try {
      if (opts.contains("xmla_endpoint"))
        throw new UnsupportedOperationException(
          "XMLA/MDX connectivity is not available in this environment"
        )
      throw new UnsupportedOperationException("no xmla_endpoint configured")
    }
    attempt match {
      case Success(df: DataFrame) => df
      case Failure(_) =>
        val fallback = opts.getOrElse(
          "fallback_csv_path",
          throw new IllegalArgumentException(
            "olap reader requires fallback_csv_path when XMLA is unavailable"
          )
        )
        spark.read.option("header", "true").csv(fallback)
    }
  }

  /** base_reader.py:44-55 — dispatch registry; unknown type message matches
    * the reference's `ValueError("Unsupported source type: …")`. The README
    * of the reference names this as THE extension point (README.md:142), so
    * the registry accepts runtime registration of custom readers.
    */
  private val builtins: Map[String, Reader] = Map(
    "csv" -> csv,
    "json" -> json,
    "parquet" -> parquet,
    "orc" -> orc,
    "text" -> text,
    "binaryfile" -> binaryFile,
    "jdbc" -> jdbc,
    "olap" -> olap
  )

  @volatile private var extra: Map[String, Reader] = Map.empty

  /** Register (or override) a reader for a catalog `type`. */
  def register(tpe: String, reader: Reader): Unit =
    synchronized { extra = extra + (tpe -> reader) }

  def registry: Map[String, Reader] = builtins ++ extra

  def get(tpe: String): Reader =
    registry.getOrElse(
      tpe,
      throw new IllegalArgumentException(s"Unsupported source type: $tpe")
    )

  private def popPath(opts: Map[String, String]): (String, Map[String, String]) =
    (required(opts, "path", "file"), opts - "path")

  private def required(opts: Map[String, String], k: String, who: String): String =
    opts.getOrElse(
      k,
      throw new IllegalArgumentException(s"$who reader requires option '$k'")
    )
}
