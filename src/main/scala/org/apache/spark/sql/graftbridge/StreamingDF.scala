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
}
