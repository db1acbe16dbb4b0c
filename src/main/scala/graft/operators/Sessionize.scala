package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: consecutive events of the same user belong to
  * one session while the gap stays ≤ `gapSeconds`.
  *
  * Batch formulation (the streaming twin lives in
  * graft.streaming.StreamingIngest.sessionizeStream): one shuffle on the
  * user key, two window passes (lag → gap flags, running sum → session ids),
  * then a per-session aggregate. All integer microsecond arithmetic —
  * deterministic and oracle-matchable.
  */
object Sessionize {

  /** → (userCol, session_id [1-based], n_events, session_start_s,
    *    session_len_s)
    */
  def sessions(events: DataFrame, userCol: String, tsCol: String,
      gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    val us = unix_micros(col(tsCol))
    val gapUs = gapSeconds * 1000000L
    val newSession =
      when(lag(us, 1).over(w).isNull || us - lag(us, 1).over(w) > gapUs, 1L)
        .otherwise(0L)
    events
      .withColumn("_sid",
        sum(newSession).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .groupBy(col(userCol), col("_sid").as("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        expr(s"min(unix_micros($tsCol)) div 1000000").as("session_start_s"),
        expr(s"(max(unix_micros($tsCol)) - min(unix_micros($tsCol))) div 1000000")
          .as("session_len_s"))
      .select(col(userCol), col("session_id"), col("n_events"),
        col("session_start_s"), col("session_len_s"))
  }
}

/** Skew-aware equi-join: replicate the build side `factor`× with a salt
  * column and scatter the probe side across the salts, so one hot key spreads
  * over `factor` reducers instead of melting a single task at 100 TB.
  *
  * Result-identical to the plain join for probe-preserving join types only
  * (inner / left_outer / left_semi / left_anti): each probe row carries ONE
  * salt and meets exactly one replica of each matching build row. Join types
  * that preserve unmatched BUILD rows (right/full outer) would emit each
  * unmatched build row once per salt replica — rejected at the door.
  */
object SkewJoin {

  private val ProbePreserving =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "semi", "left_anti", "leftanti", "anti")

  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
      factor: Int, joinType: String = "inner"): DataFrame = {
    require(ProbePreserving.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin supports probe-preserving join types ${ProbePreserving.mkString("{", ", ", "}")}; " +
        s"'$joinType' would duplicate unmatched build rows ×$factor")
    val salted = probe.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(factor)).cast("int"))
    val replicated = build.withColumn("_salt",
      explode(array((0 until factor).map(lit): _*)))
    salted.join(replicated, keys :+ "_salt", joinType).drop("_salt")
  }
}
