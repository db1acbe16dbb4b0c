package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Test-scope stage timing for the span-trim pipeline (round-17 stretch):
  * which stage of positional-hash → per-hash agg → removable join →
  * mergeRuns → cutSpans dominates a micro-batch.
  * Run: sbt "Test/runMain graft.ProfileSpanStages"
  */
object ProfileSpanStages {
  def main(args: Array[String]): Unit = {
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
    val docs = graft.queries.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val k = graft.queries.PipelineQueries.DupSpanK
    def t(label: String)(f: => Unit): Unit = {
      System.gc(); Thread.sleep(50)
      val t0 = System.nanoTime(); f
      println(f"[p] $label%-28s ${(System.nanoTime - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // warm everything once
    noop(Dedup.trimDuplicatedSpans(docs, "text", "doc_id", k))
    for (_ <- 1 to 2) {
      t("pos (hash windows)")(
        noop(Dedup.positionalWindowHashes(docs, "text", "doc_id", k)))
      val pos = Dedup.positionalWindowHashes(docs, "text", "doc_id", k)
      t("pos + firsts agg") {
        noop(pos.groupBy(col("h")).agg(count(lit(1)).as("_occ"),
          min(col("doc_id") * 1000000L + col("p")).as("_keep")))
      }
      t("full trim")(
        noop(Dedup.trimDuplicatedSpans(docs, "text", "doc_id", k)))
    }
    spark.stop()
  }
}
