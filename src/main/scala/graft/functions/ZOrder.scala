package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Z-order (Morton) curve support for multi-column data layout.
  *
  * Sorting files along the interleaved-bit curve gives every file a narrow
  * min/max range on BOTH columns simultaneously, so parquet zone-map
  * pruning works for predicates on either column — the data-layout lever
  * behind Delta's OPTIMIZE ZORDER BY, re-expressed as a codegen'd Catalyst
  * expression + `repartitionByRange` (range partitioning on the z-value is
  * exactly "cut the curve into contiguous file-sized segments").
  */
object ZOrder {

  /** Bit-interleave two ints into a 64-bit Morton code, ORDER-PRESERVING
    * under plain signed-long comparison over the full signed input range:
    * each input's sign bit is flipped (two's-complement order ⇒ unsigned
    * order), all 32 bits interleave, and the result's top bit is flipped
    * back so unsigned curve order equals signed long order. Bijective on
    * 32-bit pairs.
    */
  def interleave(a: Int, b: Int): Long = {
    val ua = a ^ Int.MinValue
    val ub = b ^ Int.MinValue
    var r = 0L
    var i = 0
    while (i < 32) {
      r |= ((ua >>> i) & 1L) << (2 * i)
      r |= ((ub >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    r ^ Long.MinValue
  }

  /** `z_value(a, b)` as a Column (codegen'd; nulls propagate). */
  def zValue(a: Column, b: Column): Column =
    ColumnBridge.column(MortonInterleave(
      ColumnBridge.expression(a.cast("int")),
      ColumnBridge.expression(b.cast("int"))))

  /** Lay `df` out along the z-curve of (a, b): range-partition on the
    * z-value (contiguous curve segments per output file), sort within each
    * partition so parquet row-group stats are tight too. `nFiles` bounds
    * the output file count.
    *
    * Interleaves the RAW values — correct, but pruning quality degrades
    * when the two axes occupy very different value ranges (the curve's
    * quadrant structure follows absolute bit positions). Prefer
    * [[zOrderByBinned]] for real layouts.
    */
  def zOrderBy(df: DataFrame, a: String, b: String, nFiles: Int): DataFrame = {
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    val z = zValue(col(a), col(b)).as("_z")
    df.withColumn("_z", z)
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
  }

  /** Range-binned z-order (what production OPTIMIZE ZORDER implementations
    * do): each column is first mapped onto `bins` uniform buckets over its
    * own [min, max] (one tiny stats aggregate, broadcast back — no driver
    * action), so both axes occupy the same bit range and the curve's
    * quadrants split BOTH dimensions evenly regardless of the columns'
    * absolute scales. Robust to axis aspect ratio; use this over
    * [[zOrderBy]] unless the raw bit patterns are already comparable.
    */
  def zOrderByBinned(df: DataFrame, a: String, b: String, nFiles: Int,
      bins: Int = 1024): DataFrame = {
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    withBinnedZ(df, a, b, bins)
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
  }

  /** `df` + a `_z` column (range-binned Morton value of (a, b)) — the
    * building block [[zOrderByBinned]] and the bucketed-hub z-order
    * compaction share; the binning stats ride a broadcast, no driver
    * action.
    */
  def withBinnedZ(df: DataFrame, a: String, b: String,
      bins: Int = 1024): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    import org.apache.spark.sql.functions._
    val stats = df.agg(
      min(col(a)).cast("double").as("_amin"),
      max(col(a)).cast("double").as("_amax"),
      min(col(b)).cast("double").as("_bmin"),
      max(col(b)).cast("double").as("_bmax"))
    def bucket(c: String, lo: String, hi: String): Column =
      width_bucket(col(c).cast("double"), col(lo),
        col(hi) + lit(1e-9), lit(bins)).cast("int")
    df.crossJoin(broadcast(stats))
      .withColumn("_z", zValue(bucket(a, "_amin", "_amax"),
        bucket(b, "_bmin", "_bmax")))
      .drop("_amin", "_amax", "_bmin", "_bmax")
  }

  /** Zone-map quality of a written parquet layout: for each of the two
    * columns, the AVERAGE fraction of the column's full span that one
    * file's [min, max] covers — the probability mass a point predicate on
    * that column cannot skip. 1.0 = blind (every file spans everything),
    * small = prunable. One grouped scan (per-file min/max via
    * `input_file_name`), `nFiles` rows collected.
    */
  def zoneMapSpanFractions(spark: org.apache.spark.sql.SparkSession,
      path: String, a: String, b: String): (Int, Double, Double) = {
    import org.apache.spark.sql.functions._
    val stats = spark.read.parquet(path)
      .groupBy(input_file_name().as("_f"))
      .agg(min(col(a)).cast("long").as("a_lo"),
        max(col(a)).cast("long").as("a_hi"),
        min(col(b)).cast("long").as("b_lo"),
        max(col(b)).cast("long").as("b_hi"))
      .collect() // one row per output file
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    def avgFrac(rs: Seq[(Long, Long)]): Double = {
      val lo = rs.map(_._1).min
      val hi = rs.map(_._2).max
      val span = math.max(hi - lo, 1L).toDouble
      rs.map { case (l, h) => (h - l).toDouble / span }.sum / rs.size
    }
    (stats.size,
      avgFrac(stats.map(s => (s._1, s._2))),
      avgFrac(stats.map(s => (s._3, s._4))))
  }
}

/** Codegen'd Morton interleave of two int keys (order-preserving over the
  * signed range — see [[ZOrder.interleave]]).
  */
case class MortonInterleave(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == IntegerType && right.dataType == IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"z_value expects (int, int), got (${left.dataType}, ${right.dataType})")
  }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrder.interleave(a.asInstanceOf[Int], b.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrder.interleave($a, $b);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
