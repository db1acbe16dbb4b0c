package graft

class WidenReadProbe extends SparkTestBase {
  import spark.implicits._
  test("parquet reader widens int32 files to a BIGINT read schema") {
    val d = tmpDir("widen_probe")
    Seq((1, "a")).toDF("k", "v").write.parquet(s"$d/p")
    val got = spark.read.schema("k BIGINT, v STRING").parquet(s"$d/p")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a")))
  }
}
