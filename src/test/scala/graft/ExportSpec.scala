package graft

import org.apache.spark.sql.functions.{col, count, input_file_name, lit, max, min, struct}

class ExportSpec extends SparkTestBase {

  test("shards are partition-pruned, size-bounded, and sorted across files") {
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
    // every physical file holds at most maxRecordsPerFile rows, and within a
    // lang the (pack_id, doc_id) ranges of distinct files must not overlap —
    // that is exactly what sortWithinPartitions + maxRecordsPerFile splits
    // guarantee, and what a sequential shard reader depends on
    val perFile = back
      .groupBy(col("lang"), input_file_name().as("f"))
      .agg(count(lit(1)).as("n"),
        min(struct(col("pack_id"), col("doc_id"))).as("lo"),
        max(struct(col("pack_id"), col("doc_id"))).as("hi"))
      .collect()
    assert(perFile.forall(_.getAs[Long]("n") <= 10L))
    assert(perFile.length > 1, "multiple shards written")
    perFile.groupBy(_.getString(0)).foreach { case (lang, files) =>
      val ranges = files.map { r =>
        val lo = r.getStruct(r.fieldIndex("lo"))
        val hi = r.getStruct(r.fieldIndex("hi"))
        ((lo.getLong(0), lo.getLong(1)), (hi.getLong(0), hi.getLong(1)))
      }.sortBy(_._1)
      ranges.sliding(2).foreach {
        case Array((_, hiPrev), (loNext, _)) =>
          assert(Ordering[(Long, Long)].lt(hiPrev, loNext),
            s"$lang: file ranges overlap: hi=$hiPrev vs next lo=$loNext")
        case _ => ()
      }
    }
  }
}
