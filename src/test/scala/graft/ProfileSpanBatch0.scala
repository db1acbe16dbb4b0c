package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Test-scope: replicate q_stream_span_trim's BATCH-0 work outside the
  * streaming harness and time each stage. Run:
  *   sbt "Test/runMain graft.ProfileSpanBatch0"
  */
object ProfileSpanBatch0 {
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
    val dir = "/root/testdata/sf0.1"
    val k = graft.queries.PipelineQueries.DupSpanK
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val docs = graft.queries.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val mid = docs.agg(max(col("doc_id"))).collect()(0).getLong(0) / 2
    val tmp = java.nio.file.Files.createTempDirectory("prof_b0")
      .toFile.getAbsolutePath
    val half = docs.filter(col("doc_id") <= mid)
    half.coalesce(1).write.parquet(s"$tmp/b0")
    val batch = spark.read.parquet(s"$tmp/b0")
    // warm codegen on the tiny sf
    for (rep <- 1 to 2) {
      val label = if (rep == 1) "cold" else "warm"
      val hub = s"$tmp/hubs$rep"
      val pos = Dedup.positionalWindowHashes(batch, "text", "doc_id", k)
      val bf = Dedup.persistForReuse(Dedup.batchWindowFirsts(pos, "doc_id"))
      val index = Dedup.persistForReuse(spark.range(0).select(
        col("id").as("h"), lit(0L).as("occ"), lit(0L).as("keep")))
      val trim = Dedup.incrementalSpanTrimFromParts(index, batch, pos, bf,
        "text", "doc_id", k)
      t(s"$label trim noop")(
        trim.write.format("noop").mode("overwrite").save())
      t(s"$label trim commit")(graft.writers.VersionedHub.writeBucketed(
        spark, trim, s"$hub/trimmed", Seq("doc_id"), 4, batchId = Some(0L)))
      val entries = bf.select(col("h"), col("_bocc").as("occ"),
        col("_bkeep").as("keep"))
      t(s"$label idx commit")(graft.writers.VersionedHub.writeBucketed(
        spark, entries, s"$hub/idx", Seq("h"), 4, batchId = Some(0L)))
      bf.unpersist(); index.unpersist()
    }
    spark.stop()
  }
}
