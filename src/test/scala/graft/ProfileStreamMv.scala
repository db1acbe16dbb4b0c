package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Test-scope profiling aid (not shipped): phase timings for
  * q_stream_mv_equiv — setup write / stream run / per-batch durations from
  * StreamingQueryProgress. Run:
  *   sbt "Test/runMain graft.ProfileStreamMv"
  */
object ProfileStreamMv {
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
    val dir = "/root/testdata/sf0.1"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    // warm
    graft.queries.IngestQueries.qStreamMvEquiv(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = scala.collection.concurrent.TrieMap.empty[Int, (Double, String)]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.put(j.jobId, (System.nanoTime(),
            Option(j.properties.getProperty("spark.job.description"))
              .getOrElse("?").take(60)))
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val (t0, d) = jobs.getOrDefault(j.jobId, (0L, "?"))
          done.put(j.jobId, ((System.nanoTime() - t0) / 1e9, d))
        }
      })

    val tmp = java.nio.file.Files.createTempDirectory("prof_mv")
      .toFile.getAbsolutePath
    val src = s"$tmp/src"
    val ev = graft.queries.Tables(spark, dir, "events")
      .select(col("event_id"), col("event_type"),
        floor(col("value") * 100).cast("long").as("cents"))
    t("setup write")(ev.repartition(3).write.parquet(src))
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val q = t("stream total") {
      val q = graft.streaming.StreamingIngest.streamingMaterializedView(
        stream, s"$tmp/hub", s"$tmp/mv", Seq("event_id"), Seq("event_type"),
        "cents", s"$tmp/cp", cntCol = "cnt", sumCol = "sum_cents",
        nBuckets = Some(8))
      q.awaitTermination()
      q
    }
    q.recentProgress.foreach { p =>
      println(s"[profile] batch ${p.batchId}: " +
        s"${p.durationMs.asScala.map { case (k, v) => s"$k=$v" }.mkString(" ")}")
    }
    t("final history+read") {
      val last = graft.writers.VersionedHub.history(spark, s"$tmp/hub")
        .last.version
      spark.read.parquet(s"$tmp/mv/v$last").orderBy(col("event_type"))
        .write.format("noop").mode("overwrite").save()
    }
    import java.nio.file.{Files => JF, Paths}
    import scala.jdk.StreamConverters._
    val nFiles = JF.walk(Paths.get(s"$tmp/hub")).toScala(Seq)
      .count(p => p.toString.endsWith(".parquet"))
    println(s"[profile] hub parquet files: $nFiles")
    Thread.sleep(300)
    done.toSeq.sortBy(_._1).foreach { case (id, (sec, desc)) =>
      println(f"[profile] job $id%3d ${sec}%6.3f s  $desc")
    }
    spark.stop()
  }
}
