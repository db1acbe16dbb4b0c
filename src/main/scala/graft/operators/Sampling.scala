package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling + frequency operators for training-data curation.
  */
object Sampling {

  /** Keep rows where `hash60(key) mod 1000 < permille`. Deterministic
    * hash-based sampling is the reproducible (re-runnable, engine-portable)
    * alternative to `df.sample()`'s RNG — at 100 TB a sample must be stable
    * across task retries, partitionings, and engines. The md5-derived hash
    * matches the DuckDB oracle bit-for-bit, is uniform, and makes the sample
    * a pure row-local filter: pushed to the scan, no state, no shuffle.
    */
  def hashSample(df: DataFrame, keyCol: Column, permille: Column): DataFrame =
    df.filter(Shingles.hash60(keyCol.cast("string")) % 1000 < permille)

  /** Stratified variant: per-stratum sampling rates (permille), e.g. boost
    * rare classes when building a training mix. `rates` maps stratum value →
    * permille; unlisted strata are dropped (rate 0).
    */
  def stratifiedHashSample(df: DataFrame, keyCol: Column, stratumCol: Column,
      rates: Map[String, Int]): DataFrame = {
    val rate = rates.foldLeft(lit(0)) { case (acc, (k, v)) =>
      when(stratumCol === k, lit(v)).otherwise(acc)
    }
    hashSample(df, keyCol, rate)
  }

  /** Top-k most frequent tokens per group (heavy hitters): explode → count →
    * rank. Two shuffles ((group, token) count, then group rank) with map-side
    * partial aggregation; ties broken lexicographically for determinism.
    * Sized for corpora where the (group, token) space fits a shuffle — for
    * web-scale vocabularies swap stage 1 for a count-min sketch.
    */
  def heavyHitters(df: DataFrame, textCol: String, groupCol: String,
      k: Int): DataFrame = {
    val counts = df
      .select(col(groupCol), explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy(col(groupCol), col("token"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("n").desc, col("token"))
    counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
