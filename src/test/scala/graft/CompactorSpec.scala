package graft

import graft.writers.{Compactor, RawWriter}
import org.apache.spark.sql.functions._

class CompactorSpec extends SparkTestBase {
  import spark.implicits._

  test("compaction collapses many small raw files, preserves content + layout") {
    val path = tmpDir("raw") + "/t"
    // simulate 6 append runs of 4 partitions each → many tiny files
    (1 to 6).foreach { run =>
      val df = (1 to 400).map(i => (run * 1000 + i, s"d${i % 4}"))
        .toDF("id", "part").repartition(4)
      RawWriter.write(df, path, Seq("part"))
    }
    val before = spark.read.parquet(path)
    val beforeRows = before.count()
    val beforeSum = before.agg(sum($"id")).collect().head.getLong(0)

    val stats = Compactor.compact(spark, path, Seq("part"))
    assert(stats.filesAfter < stats.filesBefore / 2,
      s"${stats.filesBefore} -> ${stats.filesAfter}")

    val after = spark.read.parquet(path)
    assert(after.count() == beforeRows)
    assert(after.agg(sum($"id")).collect().head.getLong(0) == beforeSum)
    // hive layout preserved → partition pruning still works
    val dirs = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("part=")).map(_.getName).toSet
    assert(dirs == Set("part=d0", "part=d1", "part=d2", "part=d3"))
  }

  test("compaction of an unpartitioned table") {
    val path = tmpDir("raw") + "/t"
    (1 to 5).foreach { _ =>
      (1 to 100).toDF("x").repartition(8).write.mode("append").parquet(path)
    }
    val stats = Compactor.compact(spark, path, Nil)
    assert(stats.filesAfter < stats.filesBefore)
    assert(spark.read.parquet(path).count() == 500)
  }
}
