package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame

/** V1 streaming sources must hand the engine a DataFrame flagged
  * `isStreaming=true`; the only way to stamp that on a batch-computed plan
  * is `private[sql] SparkSession.internalCreateDataFrame` (the DeltaSource
  * recipe) — bridged here.
  */
object StreamingDF {
  def toStreaming(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** The inverse direction, for SINKS: pin a micro-batch's incremental
    * frame to its computed RDD so a sink can run several jobs over it
    * (the ForeachBatchSink recipe).
    */
  def toBatch(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
