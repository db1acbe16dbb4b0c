package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-layout diagnostics for operating joins/aggregations at scale: a
  * key-distribution profile that tells you BEFORE running the big job
  * whether a shuffle key is skewed enough to need salting or AQE skew
  * handling (the repo's `Joins.saltedJoin` / AQE notes in SCALE.md).
  */
object Profiling {

  /** One-row skew profile of `keyCol`: key cardinality, row count, the
    * heaviest key's count, the combined count of the `topN` heaviest keys,
    * and `skew_ratio` = max_count / mean_count (1.0 = perfectly uniform;
    * a shuffle partition handling the heaviest key processes skew_ratio ×
    * the average load). The topN sum is tie-insensitive: equal counts at
    * the cutoff contribute the same sum whichever key is picked, so the
    * result is deterministic even under count ties.
    *
    * Cost: one shuffle on the key (partial+final count), then two
    * single-row aggregates over the per-key counts — no raw-row collect.
    */
  def keySkewProfile(df: DataFrame, keyCol: String, topN: Int = 10): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("_c"))
    val overall = counts.agg(
      count(lit(1)).as("n_keys"),
      sum(col("_c")).as("n_rows"),
      max(col("_c")).as("max_count"))
    val top = counts.orderBy(col("_c").desc, col(keyCol))
      .limit(topN)
      .agg(sum(col("_c")).as("topn_count"))
    overall.crossJoin(top)
      .select(col("n_keys"), col("n_rows"), col("max_count"),
        col("topn_count"),
        ((col("max_count") * col("n_keys")).cast("double") /
          col("n_rows").cast("double")).as("skew_ratio"))
  }

  /** One-row-per-column table profile — the ANALYZE verb that drives schema
    * validation and ingestion monitoring: row count, null count, EXACT
    * distinct count, and min/max rendered as strings (pre-normalize doubles
    * to DECIMAL upstream: decimal/bigint/string renderings are
    * engine-portable, raw double-to-string is not).
    *
    * Cost model: a single aggregate pass. Multiple exact count(DISTINCT)s
    * make Catalyst Expand the input |cols|-fold before the partial
    * aggregate — the standard exact plan, fine into the low tens of
    * columns; at 100 TB-wide profiles switch to [[columnProfileApprox]],
    * whose HLL sketches need no Expand and keep one narrow pass.
    * The unpivot at the end is a `stack` over ONE already-aggregated row.
    */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnProfile needs at least one column")
    val aggs = count(lit(1)).cast("long").as("_nr") +: cols.zipWithIndex.flatMap {
      case (c, i) => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).cast("long").as(s"_n$i"),
        countDistinct(col(c)).as(s"_d$i"),
        min(col(c)).cast("string").as(s"_mn$i"),
        max(col(c)).cast("string").as(s"_mx$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.zipWithIndex
      .map { case (c, i) => s"'$c', _n$i, _d$i, _mn$i, _mx$i" }
      .mkString(", ")
    one.select(col("_nr").as("n_rows"),
      expr(s"stack(${cols.size}, $rows) AS " +
        "(col_name, n_nulls, n_distinct, min_value, max_value)"))
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_value"), col("max_value"))
      .orderBy(col("col_name"))
  }

  /** The scale sibling of [[columnProfile]]: approx_count_distinct (HLL++)
    * replaces the exact distinct, so the plan is one narrow partial+final
    * aggregate with NO Expand — profile width no longer multiplies the
    * scan. Distinct counts carry HLL's ~rsd relative error; everything
    * else is exact.
    */
  def columnProfileApprox(df: DataFrame, cols: Seq[String],
      rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "columnProfileApprox needs at least one column")
    val aggs = count(lit(1)).cast("long").as("_nr") +: cols.zipWithIndex.flatMap {
      case (c, i) => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).cast("long").as(s"_n$i"),
        approx_count_distinct(col(c), rsd).as(s"_d$i"),
        min(col(c)).cast("string").as(s"_mn$i"),
        max(col(c)).cast("string").as(s"_mx$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.zipWithIndex
      .map { case (c, i) => s"'$c', _n$i, _d$i, _mn$i, _mx$i" }
      .mkString(", ")
    one.select(col("_nr").as("n_rows"),
      expr(s"stack(${cols.size}, $rows) AS " +
        "(col_name, n_nulls, n_distinct, min_value, max_value)"))
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_value"), col("max_value"))
      .orderBy(col("col_name"))
  }
}
