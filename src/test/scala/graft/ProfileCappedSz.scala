package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Test-scope A/B for the SURVIVING-SIZE step of
  * `Dedup.ngramJaccardPairsCapped` (round-17, pinning the r16 verdict's
  * q_dedup_survivors_capped drift): variant WINDOW is the shipped
  * count-over-doc_id window; variant AGG-JOIN computes surviving sizes as
  * a partial-aggregating groupBy(doc_id).count joined back (AQE picks
  * broadcast at bench SF, shuffled join at scale). Everything else —
  * df-cap mechanism, persist, self-join, clustering — is identical.
  *
  * Usage: sbt "Test/runMain graft.ProfileCappedSz [reps]"
  */
object ProfileCappedSz {
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

    def keptBare: DataFrame = {
      val posts = Dedup.sizedPostings(docs, "doc_id",
        graft.functions.TextHashExprs.wordShingleHash31Set(col("text"), 3))
      val hot = posts.groupBy(col("h")).agg(count(lit(1)).as("_df"))
        .filter(col("_df") > cap)
        .select(col("h"))
      posts.join(hot, Seq("h"), "left_anti")
    }

    // shipped: surviving size via window over doc_id
    def pairsWindowSz: DataFrame = {
      val kept = keptBare
        .withColumn("sz", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
        .select(col("doc_id"), col("sz"), col("h"))
      Dedup.jaccardPairsFromSizedPostings(Dedup.persistForReuse(kept),
        "doc_id", thr)
    }

    // candidate: surviving size via groupBy + join back
    def pairsAggJoin: DataFrame = {
      val bare = Dedup.persistForReuse(keptBare.select(col("doc_id"), col("h")))
      val szs = bare.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val kept = bare.join(szs, Seq("doc_id"))
        .select(col("doc_id"), col("sz"), col("h"))
      Dedup.jaccardPairsFromSizedPostings(Dedup.persistForReuse(kept),
        "doc_id", thr)
    }

    def run(pairs: => DataFrame): Double = {
      System.gc(); Thread.sleep(50)
      val t0 = System.nanoTime()
      Dedup.survivorsFromPairs(docs, "doc_id", pairs)
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id"))
        .write.format("noop").mode("overwrite").save()
      spark.sharedState.cacheManager.clearCache()
      (System.nanoTime() - t0) / 1e9
    }

    def calibrate(): Double = {
      System.gc(); Thread.sleep(50)
      val t0 = System.nanoTime()
      spark.range(0L, 400000000L, 1L, 32)
        .selectExpr("sum(id * (id % 7)) AS v")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    run(pairsWindowSz); run(pairsAggJoin) // warm both shapes
    val w = scala.collection.mutable.ArrayBuffer.empty[Double]
    val a = scala.collection.mutable.ArrayBuffer.empty[Double]
    val c = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (_ <- 1 to reps) {
      c += calibrate()
      w += run(pairsWindowSz)
      a += run(pairsAggJoin)
    }
    def s(xs: Seq[Double]) = xs.map(x => f"$x%.2f").mkString(", ")
    println(f"calib:    [${s(c.toSeq)}]")
    println(f"window:   [${s(w.toSeq)}] min ${w.min}%.3f")
    println(f"agg-join: [${s(a.toSeq)}] min ${a.min}%.3f")
    spark.stop()
  }
}
