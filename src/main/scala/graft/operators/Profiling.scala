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
}
