package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Test-scope A/B for the round-8 df-cap change in
  * `Dedup.ngramJaccardPairsCapped` (round-8 verdict finding #2): variant
  * WINDOW recreates the round-7 document-frequency computation (an
  * unordered window partitioned by the shingle hash — no partial
  * aggregation, hot shingle lands on one task) while variant PARTIAL-AGG
  * runs the shipped `groupBy(h).count` + broadcast anti-join of the hot
  * set. Everything downstream (surviving-size window, sized-postings
  * self-join, survivor clustering) is IDENTICAL and shared, so the delta
  * isolates the df mechanism. Interleaved reps bracketed by the Bench
  * calibration probe give a drift-normalized comparison.
  *
  * Usage: sbt "Test/runMain graft.ProfileCappedAb [reps]"
  */
object ProfileCappedAb {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cap = graft.queries.PipelineQueries.SurvivorDfCap
    val thr = graft.queries.PipelineQueries.NgramJaccardThreshold

    def docs: DataFrame = graft.queries.Tables(spark, dir, "documents")

    // round-7 shape: df via window partitioned by h (no partial agg)
    def pairsWindowDf: DataFrame = {
      val posts = Dedup.sizedPostings(docs, "doc_id",
        graft.functions.TextHashExprs.wordShingleHash31Set(col("text"), 3))
      val kept = posts
        .withColumn("_df", count(lit(1)).over(Window.partitionBy(col("h"))))
        .filter(col("_df") <= cap)
        .drop("_df", "sz")
        .withColumn("sz", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
        .select(col("doc_id"), col("sz"), col("h"))
      // persist like the shipped path does, so the delta is the df
      // mechanism alone, not persistence policy
      Dedup.jaccardPairsFromSizedPostings(Dedup.persistForReuse(kept),
        "doc_id", thr)
    }

    def runWindow(): Unit =
      Dedup.survivorsFromPairs(docs, "doc_id", pairsWindowDf)
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id"))
        .write.format("noop").mode("overwrite").save()

    def runPartialAgg(): Unit =
      graft.queries.PipelineQueries.all("q_dedup_survivors_capped")(spark, dir)
        .write.format("noop").mode("overwrite").save()

    def calibrate(): Double = {
      System.gc(); Thread.sleep(50)
      val t0 = System.nanoTime()
      spark.range(0L, 400000000L, 1L, 32)
        .selectExpr("sum(id * (id % 7)) AS v")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def time(f: () => Unit): Double = {
      System.gc(); Thread.sleep(50)
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }

    runWindow(); runPartialAgg(); calibrate() // warm all plans
    val calib0 = calibrate()
    var bestW = Double.MaxValue
    var bestP = Double.MaxValue
    for (r <- 1 to reps) {
      val w = time(runWindow _)
      val p = time(runPartialAgg _)
      bestW = math.min(bestW, w)
      bestP = math.min(bestP, p)
      println(f"[ab] rep $r window=$w%.3f partial_agg=$p%.3f")
    }
    val calib1 = calibrate()
    println(f"[ab] RESULT sf=$dir reps=$reps window_min=$bestW%.3f " +
      f"partial_agg_min=$bestP%.3f ratio=${bestP / bestW}%.3f " +
      f"calib_first=$calib0%.3f calib_last=$calib1%.3f " +
      f"load=${java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage}%.2f")
    spark.stop()
  }
}
