package graft

import graft.writers.VersionedHub

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, In, IsNotNull}

class HubDataSourceSpec extends SparkTestBase {
  import spark.implicits._

  private def mkHub(name: String, buckets: Int = 8): String = {
    val path = tmpDir(name)
    VersionedHub.writeBucketed(spark,
      (1L to 30L).map(k => (k, s"v$k")).toDF("k", "v"), path, Seq("k"), buckets)
    VersionedHub.writeBucketed(spark,
      Seq((2L, "V2"), (31L, "new")).toDF("k", "v"), path, Seq("k"), buckets)
    path
  }

  test("format(graft-hub) reads the latest snapshot and time-travels via versionAsOf") {
    val path = mkHub("dsv2_basic")
    val latest = spark.read.format("graft-hub").option("path", path).load()
      .as[(Long, String)].collect().toMap
    assert(latest == VersionedHub.read(spark, path)
      .as[(Long, String)].collect().toMap)
    assert(latest(2L) == "V2" && latest(31L) == "new" && latest.size == 31)
    val v1 = spark.read.format("graft-hub").option("path", path)
      .option("versionAsOf", "1").load()
      .as[(Long, String)].collect().toMap
    assert(v1(2L) == "v2" && !v1.contains(31L) && v1.size == 30)
  }

  test("equality/IN filters prune the scan to the matching bucket dirs") {
    val path = mkHub("dsv2_prune")
    val v = VersionedHub.history(spark, path).last
    val schema = VersionedHub.read(spark, path).schema
    // unit level: the pruning helper picks exactly the stamped bucket
    val one = graft.sources.HubDataSource.prunedBuckets(
      spark, schema, v, Seq(EqualTo("k", 7L)))
    assert(one.exists(_.size == 1), s"one key -> one bucket, got $one")
    val many = graft.sources.HubDataSource.prunedBuckets(
      spark, schema, v, Seq(In("k", Array(7L, 8L, 9L))))
    assert(many.exists(s => s.nonEmpty && s.size <= 3))
    // conjunction intersects; an unusable filter alone does not prune
    assert(graft.sources.HubDataSource.prunedBuckets(
      spark, schema, v, Seq(IsNotNull("k"))).isEmpty)
    val conj = graft.sources.HubDataSource.prunedBuckets(
      spark, schema, v, Seq(EqualTo("k", 7L), In("k", Array(7L, 8L))))
    assert(conj == one)
    // end-to-end: the executed plan scans FEWER dirs than the full snapshot
    // (RowDataSourceScan prints the V1Scan description), and rows match
    val df = spark.read.format("graft-hub").option("path", path).load()
      .filter($"k" === 7L)
    assert(df.as[(Long, String)].collect().toSeq == Seq((7L, "v7")))
    val planStr = df.queryExecution.executedPlan.toString
    val m = "dirs=(\\d+)/(\\d+)".r.findFirstMatchIn(planStr)
    assert(m.isDefined, s"expected graft-hub scan description in:\n$planStr")
    assert(m.get.group(1).toInt < m.get.group(2).toInt,
      s"scan must be bucket-pruned: $planStr")
    // filters still verified post-scan: a key hashing into a NON-pruned
    // bucket predicate returns nothing rather than bucket-mates
    assert(spark.read.format("graft-hub").option("path", path).load()
      .filter($"k" === 999L).isEmpty)
  }

  test("evolved columns survive pruning as nulls (manifest schema alignment)") {
    val path = mkHub("dsv2_evolve")
    // schema evolution confined to key 1's bucket
    VersionedHub.writeBucketed(spark,
      Seq((1L, "V1", 9.5)).toDF("k", "v", "extra"), path, Seq("k"), 8)
    // a filtered read that prunes AWAY the evolved bucket must still expose
    // the column (all-null), like the full read does
    val other = (2L to 30L).find { cand =>
      val a = graft.sources.HubDataSource.prunedBuckets(spark,
        VersionedHub.read(spark, path).schema,
        VersionedHub.history(spark, path).last, Seq(EqualTo("k", cand)))
      val b = graft.sources.HubDataSource.prunedBuckets(spark,
        VersionedHub.read(spark, path).schema,
        VersionedHub.history(spark, path).last, Seq(EqualTo("k", 1L)))
      a.isDefined && b.isDefined && (a.get intersect b.get).isEmpty
    }.get
    val row = spark.read.format("graft-hub").option("path", path).load()
      .filter($"k" === other)
      .select($"k", $"v", $"extra").as[(Long, String, Option[Double])]
      .collect().toSeq
    assert(row.map(_._1) == Seq(other) && row.head._3.isEmpty)
    // and the evolved row itself reads back through the connector
    val evolved = spark.read.format("graft-hub").option("path", path).load()
      .filter($"k" === 1L).select($"extra").as[Option[Double]]
      .collect().toSeq
    assert(evolved == Seq(Some(9.5)))
  }

  test("unfiltered count(*) is answered from the manifest with zero file I/O") {
    val path = mkHub("dsv2_count")
    val df = spark.read.format("graft-hub").option("path", path).load()
    assert(df.count() == 31L)
    // the plan must carry the manifest-count relation, not a parquet scan
    val agg = df.groupBy().count()
    val planStr = agg.queryExecution.executedPlan.toString
    assert(planStr.contains("count-from-manifest"),
      s"expected manifest-answered count in:\n$planStr")
    assert(agg.collect().head.getLong(0) == 31L)
    // time travel counts the requested snapshot
    assert(spark.read.format("graft-hub").option("path", path)
      .option("versionAsOf", "1").load().count() == 30L)
    // a FILTERED count must take the row path and stay correct (pruning
    // never short-circuits through the manifest)
    val filtered = df.filter($"k" <= 5L)
    assert(filtered.count() == 5L)
    assert(!filtered.groupBy().count().queryExecution.executedPlan.toString
      .contains("count-from-manifest"))
  }

  test("scan reports manifest-backed statistics (pruned row counts)") {
    val path = mkHub("dsv2_stats")
    val v = VersionedHub.history(spark, path).last
    val schema = VersionedHub.read(spark, path).schema
    val full = new graft.sources.HubScanBuilder(path, v, schema)
    val fullStats = full.build()
      .asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics()
    assert(fullStats.numRows.getAsLong == 31L)
    assert(fullStats.sizeInBytes.getAsLong > 0L &&
      fullStats.sizeInBytes.getAsLong < Long.MaxValue)
    // pruned scan: row estimate shrinks to the probed bucket's audit count
    val prunedBuilder = new graft.sources.HubScanBuilder(path, v, schema)
    prunedBuilder.pushFilters(Array(EqualTo("k", 7L)))
    val prunedStats = prunedBuilder.build()
      .asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics()
    assert(prunedStats.numRows.getAsLong < 31L &&
      prunedStats.numRows.getAsLong >= 1L)
  }

  test("df.write.format(graft-hub) commits an ACID merge-upsert version") {
    val path = mkHub("dsv2_write")
    Seq((2L, "WRITTEN"), (40L, "ins")).toDF("k", "v")
      .write.format("graft-hub").option("path", path).option("keys", "k")
      .mode("append").save()
    val after = VersionedHub.read(spark, path)
      .as[(Long, String)].collect().toMap
    assert(after(2L) == "WRITTEN" && after(40L) == "ins" && after.size == 32)
    // one new committed version; bucketed layout preserved
    val hist = VersionedHub.history(spark, path)
    assert(hist.size == 3 && hist.last.buckets.nonEmpty)
    // reading back through the connector sees the write
    assert(spark.read.format("graft-hub").option("path", path).load()
      .filter($"k" === 2L).as[(Long, String)].collect().toSeq ==
      Seq((2L, "WRITTEN")))
    // time-travel snapshots are immutable targets
    intercept[Exception] {
      Seq((1L, "x")).toDF("k", "v").write.format("graft-hub")
        .option("path", path).option("versionAsOf", "1").option("keys", "k")
        .mode("append").save()
    }
  }

  test("column pruning and flat hubs work through the connector") {
    val flat = tmpDir("dsv2_flat")
    VersionedHub.write(spark,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), flat, Seq("k"))
    val got = spark.read.format("graft-hub").option("path", flat).load()
      .select($"v").as[String].collect().toSet
    assert(got == Set("a", "b"))
    // count(*) path (zero required columns)
    assert(spark.read.format("graft-hub").option("path", flat).load()
      .count() == 2)
    intercept[IllegalArgumentException] {
      spark.read.format("graft-hub").option("path", flat)
        .option("versionAsOf", "9").load().collect()
    }
  }
}
