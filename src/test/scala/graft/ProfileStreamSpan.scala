package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Test-scope profiling aid (not shipped): phase timings for
  * q_stream_span_trim — setup write / stream run / per-batch durations.
  * Run: sbt "Test/runMain graft.ProfileStreamSpan"
  */
object ProfileStreamSpan {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
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
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    // warm plans/codegen at the small SF
    graft.queries.PipelineQueries.all("q_stream_span_trim")(
      spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()

    val k = graft.queries.PipelineQueries.DupSpanK
    val tmp = java.nio.file.Files.createTempDirectory("prof_span")
      .toFile.getAbsolutePath
    val src = s"$tmp/src"
    val docs = graft.queries.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val mid = t("setup max")(
      docs.agg(max(col("doc_id"))).collect()(0).getLong(0) / 2)
    val srcDir = new java.io.File(src); srcDir.mkdirs()
    t("setup write") {
      val stage = s"$tmp/stage"
      docs.withColumn("_half", when(col("doc_id") <= mid, 0).otherwise(1))
        .coalesce(1).write.partitionBy("_half").parquet(stage)
      (0 until 2).foreach { i =>
        val part = new java.io.File(s"$stage/_half=$i").listFiles()
          .find(_.getName.endsWith(".parquet")).get
        val dst = new java.io.File(srcDir, s"b$i.parquet")
        java.nio.file.Files.copy(part.toPath, dst.toPath)
        require(dst.setLastModified(1000000000000L + i * 60000L))
      }
    }
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    val q = t("stream total") {
      val q = graft.streaming.StreamingIngest.spanTrimStream(stream,
        s"$tmp/idx", s"$tmp/trimmed", nBuckets = 4, "text", "doc_id", k,
        s"$tmp/cp")
      q.awaitTermination()
      q
    }
    q.recentProgress.foreach { p =>
      println(s"[profile] batch ${p.batchId} rows=${p.numInputRows}: " +
        s"${p.durationMs.asScala.map { case (kk, v) => s"$kk=$v" }.mkString(" ")}")
    }
    t("final read") {
      graft.writers.VersionedHub.read(spark, s"$tmp/trimmed")
        .select(col("doc_id"), col("n_tokens"), col("n_tokens_kept"),
          col("text_trimmed"))
        .orderBy(col("doc_id"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
