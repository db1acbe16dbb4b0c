package graft

import graft.functions.ZOrder
import graft.writers.VersionedHub

import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  test("interleave is order-preserving per axis and handles the signed range") {
    assert(ZOrder.interleave(0, 0) >= 0)
    // increasing one axis with the other fixed increases the z-value
    val fixed = 12345
    val xs = Seq(Int.MinValue, -7, -1, 0, 1, 42, Int.MaxValue)
    val zs = xs.map(ZOrder.interleave(_, fixed))
    assert(zs == zs.sorted, s"z not monotonic in a: $zs")
    val zs2 = xs.map(ZOrder.interleave(fixed, _))
    assert(zs2 == zs2.sorted, s"z not monotonic in b: $zs2")
    // distinct inputs → distinct codes (bijective on 31-bit pairs)
    assert(xs.flatMap(a => xs.map(b => ZOrder.interleave(a, b))).distinct.size
      == xs.size * xs.size)
  }

  test("z_value column matches the Scala function (codegen path)") {
    val df = Seq((3, 9), (-5, 7), (100, -200)).toDF("a", "b")
      .withColumn("z", ZOrder.zValue($"a", $"b"))
    df.select($"a", $"b", $"z").as[(Int, Int, Long)].collect().foreach {
      case (a, b, z) => assert(z == ZOrder.interleave(a, b))
    }
  }

  /** Per-file [min,max] of `c` across the parquet files under `dir`. */
  private def fileRanges(dir: String, c: String): Seq[(Long, Long)] = {
    new java.io.File(dir).listFiles.toSeq
      .filter(_.getName.endsWith(".parquet"))
      .map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min(col(c)).cast("long"), max(col(c)).cast("long"))
          .as[(Long, Long)].head()
        r
      }
  }

  private def filesContaining(ranges: Seq[(Long, Long)], v: Long): Int =
    ranges.count { case (lo, hi) => lo <= v && v <= hi }

  test("z-ordered layout prunes on BOTH columns; linear sort only on one") {
    // two independent uniform keys — the worst case for single-column sort
    val n = 20000
    val rows = (0 until n).map { i =>
      (i * 2654435761L % 1000, i * 40503L % 1000, i)
    }.map { case (a, b, i) => (a.toInt, b.toInt, i) }
    val df = rows.toDF("a", "b", "payload")
    val nFiles = 16
    val zDir = tmpDir("zorder_z")
    ZOrder.zOrderBy(df, "a", "b", nFiles).write.mode("overwrite").parquet(zDir)
    val linDir = tmpDir("zorder_lin")
    df.repartitionByRange(nFiles, col("a")).sortWithinPartitions(col("a"))
      .write.mode("overwrite").parquet(linDir)
    // pruning on a: both layouts good (z slightly coarser is fine)
    // pruning on b: linear layout is blind (every file spans ~full range),
    // z-order must cut the candidate file set at least in half
    val probeB = 500L
    val zB = filesContaining(fileRanges(zDir, "b"), probeB)
    val linB = filesContaining(fileRanges(linDir, "b"), probeB)
    assert(linB >= nFiles - 2, s"linear layout should be blind on b, got $linB")
    assert(zB * 2 <= linB, s"z-order must halve b-candidates: z=$zB lin=$linB")
    val probeA = 500L
    val zA = filesContaining(fileRanges(zDir, "a"), probeA)
    assert(zA <= nFiles / 2, s"z-order must still prune on a: $zA")
  }

  test("zone-map span fractions meet the tight 0.5 bound at 4- and 32-way input parallelism") {
    // the oracle (q_zorder_prune) uses a 0.75 margin that no
    // partitioning/sampling variance can cross; THIS is the tight
    // contract — a point predicate on either column skips at least half
    // the data on average — asserted under both a narrow and a wide input
    // partitioning so the bound is provably parallelism-stable, not
    // empirically lucky at one layout
    val n = 20000
    val rows = (0 until n).map { i =>
      ((i * 2654435761L % 1000).toInt, (i * 40503L % 1000).toInt, i)
    }
    for (parts <- Seq(4, 32)) {
      val df = rows.toDF("a", "b", "payload").repartition(parts)
      val out = tmpDir(s"zspan$parts")
      ZOrder.zOrderBy(df, "a", "b", 16).write.mode("overwrite").parquet(out)
      val (files, fracA, fracB) =
        ZOrder.zoneMapSpanFractions(spark, out, "a", "b")
      assert(files >= 2, s"parts=$parts wrote $files files")
      assert(fracA <= 0.5 && fracB <= 0.5,
        s"parts=$parts: avg span fractions a=$fracA b=$fracB exceed 0.5")
    }
  }

  test("optimizeZOrder commits a content-identical re-laid version") {
    val path = tmpDir("vhub_zorder")
    val df = (1 to 500).map(i => (i, (i * 37) % 100, s"v$i"))
      .toDF("k", "g", "v")
    VersionedHub.write(spark, df, path, Seq("k"))
    val v = VersionedHub.optimizeZOrder(spark, path, "k", "g",
      targetFileRows = 100)
    assert(v == 2)
    val before = VersionedHub.read(spark, path, Some(1))
      .as[(Int, Int, String)].collect().toSet
    val after = VersionedHub.read(spark, path, Some(2))
      .as[(Int, Int, String)].collect().toSet
    assert(before == after)
  }
}
