package graft

import graft.writers.VersionedHub

/** Evidence probe for the incremental commit log: manifest bytes per SMALL
  * commit must stay flat as the table's total file count grows 10× (the
  * 100 TB log-growth contract — pre-round-12 manifests carried the full
  * per-file stats map, O(total files) JSON per commit).
  *
  * Run: `sbt "Test/runMain graft.ProfileManifestScale"`; results recorded
  * in SCALE.md.
  */
object ProfileManifestScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.session
    import spark.implicits._

    def scenario(nRows: Int, filesPerBucket: Int): (Int, Long, Seq[Long], Long) = {
      val path = java.nio.file.Files
        .createTempDirectory(s"manifest_scale_$nRows").toString
      VersionedHub.writeBucketed(spark,
        (1 to nRows).map(i => (i, s"v$i")).toDF("k", "v")
          .repartition(filesPerBucket),
        path, Seq("k"), 8, optimizeWrite = false)
      val nFiles = VersionedHub.history(spark, path).last.fileStats.size
      def mlen(n: Int) =
        new java.io.File(s"$path/_log/" + f"$n%08d.json").length()
      val v1Len = mlen(1)
      for (i <- 1 to 3)
        VersionedHub.writeBucketed(spark,
          Seq((i * 997, s"U$i")).toDF("k", "v"), path, Seq("k"), 8)
      (nFiles, v1Len, (2 to 4).map(mlen), mlen(1))
    }

    val (fSmall, v1Small, upsSmall, _) = scenario(4000, 6)
    val (fBig, v1Big, upsBig, _) = scenario(40000, 60)
    println(f"""{"probe":"manifest_bytes_per_commit","small":{"total_files":$fSmall,"bulk_manifest_bytes":$v1Small,"small_commit_bytes":[${upsSmall.mkString(",")}]},"x10":{"total_files":$fBig,"bulk_manifest_bytes":$v1Big,"small_commit_bytes":[${upsBig.mkString(",")}]},"flat_ratio":${upsBig.max.toDouble / upsSmall.max}}""")
  }
}
