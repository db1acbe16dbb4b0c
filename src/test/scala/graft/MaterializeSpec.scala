package graft

import graft.operators.Materialize
import graft.writers.VersionedHub

import org.apache.spark.sql.functions._

class MaterializeSpec extends SparkTestBase {
  import spark.implicits._

  test("CDF delta refresh equals full recompute, incl. group migration and group drop") {
    val hub = tmpDir("graft_ivm_spec") + "/hub"
    val v1 = Seq((1L, "x", 10L), (2L, "x", 20L), (3L, "y", 30L))
      .toDF("id", "grp", "m")
    VersionedHub.write(spark, v1, hub, Seq("id"))
    // id 2 migrates x→z; id 3 migrates y→x (emptying group y); id 4 inserts
    val batch = Seq((2L, "z", 25L), (3L, "x", 31L), (4L, "z", 5L))
      .toDF("id", "grp", "m")
    VersionedHub.write(spark, batch, hub, Seq("id"))

    val cdf = VersionedHub.changesCDF(spark, hub, Seq("id"), 1, 2)
    val types = cdf.groupBy(col("_change_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(types == Map("insert" -> 1L,
      "update_preimage" -> 2L, "update_postimage" -> 2L))

    val base = VersionedHub.read(spark, hub, Some(1))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("cnt"), sum(col("m")).as("s"))
    val refreshed = Materialize
      .applyCountSumDelta(base, cdf, Seq("grp"), "m", "cnt", "s")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val recomputed = VersionedHub.read(spark, hub)
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("cnt"), sum(col("m")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(refreshed == recomputed)
    // group y vanished (its only member migrated) — must be dropped, not 0
    assert(!refreshed.exists(_._1 == "y"))
    // group z exists only in the delta — full-outer side
    assert(refreshed.exists(_._1 == "z"))
  }

  test("changesCDF under schema drift: added column reads as null preimage") {
    val hub = tmpDir("graft_cdf_drift") + "/hub"
    val v1 = Seq((1L, "x"), (2L, "y")).toDF("id", "grp")
    VersionedHub.write(spark, v1, hub, Seq("id"))
    // v2 adds a measure column and touches only id 2
    val batch = Seq((2L, "y", 7L)).toDF("id", "grp", "m")
    VersionedHub.write(spark, batch, hub, Seq("id"))
    val cdf = VersionedHub.changesCDF(spark, hub, Seq("id"), 1, 2)
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getString(3)))
      .toSet
    // id 1 is unchanged (new column null on both reconciled sides);
    // id 2 is an update: preimage with null m, postimage with m=7
    assert(cdf == Set(
      (2L, "y", None, "update_preimage"),
      (2L, "y", Some(7L), "update_postimage")))
    // and a count/sum view over the drifted column still refreshes
    // consistently: null preimage contributes nothing to the sum, exactly
    // like the base aggregate ignored it
    val base = VersionedHub.read(spark, hub, Some(1))
      .withColumn("m", lit(null).cast("long"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("cnt"), sum(col("m")).as("s"))
    val refreshed = Materialize.applyCountSumDelta(
      base, VersionedHub.changesCDF(spark, hub, Seq("id"), 1, 2),
      Seq("grp"), "m", "cnt", "s")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    val recomputed = VersionedHub.read(spark, hub)
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("cnt"), sum(col("m")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    assert(refreshed == recomputed)
  }

  test("streaming MV step survives crash-replay at every boundary") {
    val tmp = tmpDir("graft_mv_crash")
    val hub = s"$tmp/hub"
    val mv = s"$tmp/mv"
    def step(df: org.apache.spark.sql.DataFrame, id: Long) =
      graft.streaming.StreamingIngest.mvRefreshStep(
        df, id, hub, mv, Seq("id"), Seq("grp"), "m", "cnt", "s",
        nBuckets = Some(2))
    def view(v: Int) = spark.read.parquet(s"$mv/v$v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    val b1 = Seq((1L, "x", 10L), (2L, "y", 20L)).toDF("id", "grp", "m")
    val b2 = Seq((2L, "y", 25L), (3L, "x", 5L)).toDF("id", "grp", "m")
    assert(step(b1, 1L) == 1)
    val v1 = view(1)
    assert(v1 == Set(("x", 1L, 10L), ("y", 1L, 20L)))

    // crash AFTER hub commit, BEFORE view write: simulate by committing
    // the hub directly, then replaying the full step with the same id
    graft.writers.VersionedHub.writeBucketed(
      spark, b2, hub, Seq("id"), 2, batchId = Some(2L))
    assert(step(b2, 2L) == 2) // hub replay short-circuits; view catches up
    val v2 = view(2)
    assert(v2 == Set(("x", 2L, 15L), ("y", 1L, 25L)))

    // full replay of a COMPLETED batch: both hub and view are no-ops
    assert(step(b2, 2L) == 2)
    assert(view(2) == v2 && view(1) == v1)
  }
}
