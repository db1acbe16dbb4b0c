package graft

import org.apache.spark.sql.SparkSession

/** Test-scope profiling aid: per-Spark-job timings for one SparkEntry
  * query at sf0.1. Usage: sbt "Test/runMain graft.ProfileQuery q_dup_spans"
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_dup_spans")
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
    def execute(): Unit =
      SparkEntry.queries(name)(spark, "/root/testdata/sf0.1")
        .write.format("noop").mode("overwrite").save()
    execute() // warm
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val done = scala.collection.concurrent.TrieMap.empty[Int, (Double, Int)]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.put(j.jobId, System.nanoTime())
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          done.put(j.jobId,
            ((System.nanoTime() - jobs.getOrDefault(j.jobId, 0L)) / 1e9, 0))
      })
    val t0 = System.nanoTime()
    execute()
    println(f"[profile] $name total ${(System.nanoTime() - t0) / 1e9}%.3f s")
    Thread.sleep(300)
    done.toSeq.sortBy(_._1).foreach { case (id, (sec, _)) =>
      println(f"[profile] job $id%3d ${sec}%6.3f s")
    }
    spark.stop()
  }
}
