package graft

import graft.writers.VersionedHub

import org.apache.spark.sql.functions.col

/** Evidence probe for DELETION VECTORS: a surgical delete (a handful of
  * rows) must cost O(matches) — a manifest-only commit — instead of
  * rewriting every candidate bucket. Measures wall time, data files
  * written and manifest bytes for the SAME 4-row delete with DVs on vs
  * off, at two table sizes (the gap must WIDEN with table size: the
  * rewrite scales with bucket bytes, the DV commit does not).
  *
  * Run: `sbt "Test/runMain graft.ProfileDvDelete"`; results recorded in
  * SCALE.md.
  */
object ProfileDvDelete {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.session
    import spark.implicits._

    def parquetFiles(path: String): Long = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(path))
      try s.filter(p => p.toString.endsWith(".parquet")).count()
      finally s.close()
    }

    def scenario(nRows: Int, dvEnabled: Boolean): (Long, Long, Long) = {
      val path = java.nio.file.Files
        .createTempDirectory(s"dv_probe_${nRows}_$dvEnabled").toString
      VersionedHub.writeBucketed(spark,
        (1 to nRows).map(i => (i.toLong, s"v$i", i % 97)).toDF("k", "v", "n"),
        path, Seq("k"), 16)
      val before = parquetFiles(path)
      spark.conf.set("spark.graft.hub.dv.enabled", dvEnabled.toString)
      val t0 = System.nanoTime()
      try VersionedHub.deleteWhere(spark, path,
        col("k").isin(3L, 977L, nRows / 2L, nRows - 5L))
      finally spark.conf.set("spark.graft.hub.dv.enabled", "true")
      val ms = (System.nanoTime() - t0) / 1000000
      val filesWritten = parquetFiles(path) - before
      val manifestBytes = new java.io.File(
        s"$path/_log/" + f"${2}%08d.json").length()
      require(VersionedHub.read(spark, path).count() == nRows - 4L)
      (ms, filesWritten, manifestBytes)
    }

    // warm the JVM/planner on a throwaway round
    scenario(20000, dvEnabled = true)
    val out = for {
      n <- Seq(100000, 1000000)
      dv <- Seq(true, false)
    } yield {
      val (ms, files, bytes) = scenario(n, dv)
      s"""{"rows":$n,"dv":$dv,"ms":$ms,"files_written":$files,"manifest_bytes":$bytes}"""
    }
    println(s"""{"probe":"dv_surgical_delete","runs":[${out.mkString(",")}]}""")
  }
}
