package graft.writers

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Evidence dump for plans/r19: the bucketed commit's merge+layout plan
  * BEFORE (classic key-window merge followed by the optimized write's
  * bucket repartition — two exchanges) and AFTER (single-exchange
  * run-merge). Usage: Test/runMain graft.writers.MergePlanDump <outDir>
  */
object MergePlanDump {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("plans/r19")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def stamp(df: org.apache.spark.sql.DataFrame) =
      df.withColumn(HubWriter.BucketCol,
        pmod(coalesce(col("k"), lit(-7)), lit(4)).cast("int"))
    val target = Seq((1, 10), (2, 20), (5, 50)).toDF("k", "v")
    val source = Seq((2, 21), (3, 30)).toDF("k", "v")
    val before = stamp(HubWriter.merge(target, source, Seq("k")))
      .repartition(col(HubWriter.BucketCol))
    val after = HubWriter.mergeBucketedByRun(
      stamp(target), stamp(source), Seq("k"), HubWriter.BucketCol)
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      Files.writeString(Paths.get(out, name), df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    dump("bucketed_merge_before.txt", before)
    dump("bucketed_merge_after.txt", after)
    println(s"wrote $out/bucketed_merge_{before,after}.txt")
    spark.stop()
  }
}
