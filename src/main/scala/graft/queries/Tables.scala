package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loads the driver-generated test tables
  * (`/root/testdata/sf{0.001,0.01,0.1}/name.parquet`, see TESTDATA.md). Plain
  * parquet scans: Catalyst gets predicate pushdown + column pruning for free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark only reads via
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set in every session
    * builder here). Re-materialize it as a proper TimestampType (micros) with
    * integer division — ns since epoch exceeds 2^53, so float division would
    * corrupt it.
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" &&
      df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }
}
