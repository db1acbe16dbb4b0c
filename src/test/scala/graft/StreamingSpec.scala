package graft

import graft.queries.Tables
import graft.streaming.StreamingIngest
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  test("streaming hub upsert via foreachBatch merges each micro-batch") {
    val lake = tmpDir("slake")
    val src = s"$lake/in"
    new java.io.File(src).mkdirs()
    // batch 1
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("append").parquet(src)
    val stream = StreamingIngest.parquetStream(
      spark, src, Seq((0L, "x")).toDF("id", "v"))
    val q1 = StreamingIngest.hubUpsertStream(
      stream, s"$lake/hub", Seq("id"), s"$lake/ckpt")
    q1.awaitTermination()
    assert(spark.read.parquet(s"$lake/hub").count() == 2)
    // batch 2: update id=2, insert id=3; checkpoint resumes exactly-once
    Seq((2L, "B"), (3L, "c")).toDF("id", "v")
      .write.mode("append").parquet(src)
    val q2 = StreamingIngest.hubUpsertStream(
      StreamingIngest.parquetStream(spark, src, Seq((0L, "x")).toDF("id", "v")),
      s"$lake/hub", Seq("id"), s"$lake/ckpt")
    q2.awaitTermination()
    val out = spark.read.parquet(s"$lake/hub").as[(Long, String)]
      .collect().toMap
    assert(out == Map(1L -> "a", 2L -> "B", 3L -> "c"))
  }

  test("windowed streaming agg matches the batch rollup on the same data") {
    val events = Tables(spark, "/root/testdata/sf0.001", "events")
    // run the same plan in batch mode (streaming/batch unification)
    val batchResult = StreamingIngest.windowedEventCounts(events)
      .orderBy(col("window_start"), col("event_type"))
    val expected = events
      .withColumn("window_start", date_trunc("hour", col("ts")))
      .groupBy(col("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy(col("window_start"), col("event_type"))
    val got = batchResult.select($"window_start", $"event_type", $"n_events")
      .collect().toSeq
    assert(got == expected.collect().toSeq)
  }

  test("true streaming execution: memory sink receives windowed aggregates") {
    val lake = tmpDir("slake2")
    val src = s"$lake/in"
    new java.io.File(src).mkdirs()
    Tables(spark, "/root/testdata/sf0.001", "events")
      .write.mode("append").parquet(src)
    val stream = StreamingIngest.parquetStream(
      spark, src, Tables(spark, "/root/testdata/sf0.001", "events"))
    val agg = StreamingIngest.windowedEventCounts(stream)
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("win_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val n = spark.sql("SELECT sum(n_events) FROM win_out").collect()(0).getLong(0)
    assert(n == 1000L, "all events flow through the windowed stream")
  }
}
