package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-ordered join operators the built-in API lacks as single verbs,
  * composed from shuffle-friendly primitives (SURVEY.md §7.4 preference
  * order: compose existing ops before custom plans).
  */
object AsofJoin {

  /** As-of join: for each left row, attach the latest right row of the same
    * key with `right.ts <= left.ts` (inclusive, DuckDB `ASOF JOIN` / kdb `aj`
    * semantics). Unmatched left rows keep null right columns (left join).
    *
    * Execution shape — the 100 TB-safe formulation: instead of a range join
    * (which Spark would plan as a per-key cartesian + filter), tag and UNION
    * the two sides, then one window pass per key ordered by (ts, side):
    * `last(right_value, ignoreNulls)` over the unbounded-preceding frame
    * carries the most recent right payload forward into each left row. Cost:
    * ONE shuffle on the key (the window sort), zero row blowup, no skew
    * amplification beyond the key's own row count.
    *
    * `rightCols` are the right-side payload columns to carry (key and ts
    * excluded). Right rows tie-sorting at the same ts sort BEFORE left rows
    * (inclusive as-of); among right duplicates at one ts the LAST after a
    * (ts, rightCols) sort wins — deterministic for oracle comparison.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.StructType
    val internal = Set("_ts", "_side", "_rv", "_rlast")
    val clash = (left.columns ++ rightCols).filter(internal)
    require(clash.isEmpty,
      s"asofJoin reserves column names ${internal.mkString(", ")}; " +
        s"rename input columns: ${clash.mkString(", ")}")
    val dup = rightCols.filter(left.columns.contains)
    require(dup.isEmpty,
      s"rightCols collide with left columns (output would be ambiguous): " +
        dup.mkString(", "))
    // the dedup tie-break sorts the _rv payload struct, so every carried
    // right column must have an orderable type — fail fast with a clear
    // message instead of a late, opaque analysis error on the window sort
    val unorderable = rightCols.filterNot(c =>
      org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(
        right.schema(c).dataType))
    require(unorderable.isEmpty,
      "asofJoin orders right duplicates at equal ts by the payload columns, " +
        s"which must be orderable types; not orderable: " +
        unorderable.map(c => s"$c: ${right.schema(c).dataType.simpleString}")
          .mkString(", ") +
        " — drop the column from rightCols or pre-dedup right on (key, ts)")
    val leftCols = left.columns.filterNot(_ == key).toSeq
    val rvType = StructType(rightCols.map(c => right.schema(c)))
    val l = left.select(
      Seq(col(key), col(leftTs).as("_ts"), lit(1).as("_side"),
        lit(null).cast(rvType).as("_rv")) ++ leftCols.map(col): _*)
    val r = right.select(
      Seq(col(key), col(rightTs).as("_ts"), lit(0).as("_side"),
        struct(rightCols.map(col): _*).as("_rv")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col("_ts"), col("_side"), col("_rv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_rlast", last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(Seq(col(key)) ++ leftCols.map(col) ++
        rightCols.map(c => col(s"_rlast.$c").as(c)): _*)
  }

  /** As-of join, slim-union variant for wide left schemas.
    *
    * [[asofJoin]] carries every left column through the union, so right rows
    * pay null padding for the whole left schema and the window sort moves
    * wide rows. Here the window pass runs over the DISTINCT left
    * `(key, ts)` probe set unioned with the right side — 4 slim columns
    * regardless of the left schema — exploiting that the as-of answer is a
    * function of `(key, leftTs)` alone (right rows tie-sort before left
    * rows, so equal probes always resolve identically). The matched payload
    * then joins back on null-safe `(key, ts)` equality, which reproduces the
    * window's null-key partitioning exactly (a plain equality join would
    * drop null-key left rows that [[asofJoin]] keeps).
    *
    * Cost shape: one extra shuffle (the distinct + the join-back) in
    * exchange for never sorting or null-padding the left payload; the
    * join-back is a hash join Catalyst can broadcast when the probe set is
    * small. Results are identical to [[asofJoin]] (spec-asserted).
    */
  def asofJoinSlim(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.StructType
    val internal = Set("_ts", "_side", "_rv", "_rlast", "_mk", "_mts")
    val clash = (left.columns ++ rightCols).filter(internal)
    require(clash.isEmpty,
      s"asofJoinSlim reserves column names ${internal.mkString(", ")}; " +
        s"rename input columns: ${clash.mkString(", ")}")
    val dup = rightCols.filter(left.columns.contains)
    require(dup.isEmpty,
      s"rightCols collide with left columns (output would be ambiguous): " +
        dup.mkString(", "))
    val unorderable = rightCols.filterNot(c =>
      org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(
        right.schema(c).dataType))
    require(unorderable.isEmpty,
      "asofJoinSlim orders right duplicates at equal ts by the payload " +
        "columns, which must be orderable types; not orderable: " +
        unorderable.map(c => s"$c: ${right.schema(c).dataType.simpleString}")
          .mkString(", ") +
        " — drop the column from rightCols or pre-dedup right on (key, ts)")
    val leftCols = left.columns.filterNot(_ == key).toSeq
    val rvType = StructType(rightCols.map(c => right.schema(c)))
    val probes = left.select(col(key), col(leftTs)).distinct()
    val l = probes.select(col(key), col(leftTs).as("_ts"),
      lit(1).as("_side"), lit(null).cast(rvType).as("_rv"))
    val r = right.select(col(key), col(rightTs).as("_ts"),
      lit(0).as("_side"), struct(rightCols.map(col): _*).as("_rv"))
    val w = Window.partitionBy(col(key))
      .orderBy(col("_ts"), col("_side"), col("_rv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .withColumn("_rlast", last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(Seq(col(key).as("_mk"), col("_ts").as("_mts")) ++
        rightCols.map(c => col(s"_rlast.$c").as(c)): _*)
    // every probe row survives the window (side=1 rows are kept whether or
    // not _rlast matched), so an inner null-safe join preserves left fan-out
    left.join(matched,
        col(key) <=> col("_mk") && col(leftTs) <=> col("_mts"))
      .select(Seq(col(key)) ++ leftCols.map(col) ++ rightCols.map(col): _*)
  }
}

/** Interval/range join via bucketing: the equi-join-able formulation of
  * `point BETWEEN lo AND hi`.
  */
object RangeJoin {

  /** Join `points` (with a numeric `valueCol`) to `intervals` rows whose
    * `[loCol, hiCol)` contains the value.
    *
    * Spark plans a raw non-equi join as BroadcastNestedLoop (dies at scale
    * unless one side is tiny). This bucketed rewrite turns it into an
    * EQUI-join: each interval explodes into the `bucketSize`-wide buckets it
    * overlaps, points map to exactly one bucket, join on the bucket key, then
    * re-check exact containment. Work ∝ points + Σ interval_width/bucketSize
    * — hash-partitionable, AQE-skew-splittable, no nested loop.
    */
  def bucketedRangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      valueCol: String,
      loCol: String,
      hiCol: String,
      bucketSize: Double): DataFrame = {
    require(bucketSize > 0, "bucketSize must be positive")
    // mirror asofJoin's up-front validation: shared names would make the
    // post-join containment filter's col(valueCol)/col(loCol) references
    // ambiguous and throw a confusing AnalysisException deep in analysis
    val shared = points.columns.filter(intervals.columns.contains)
    require(shared.isEmpty,
      "bucketedRangeJoin requires disjoint column names between points and " +
        s"intervals (alias one side); shared: ${shared.mkString(", ")}")
    val reserved = (points.columns ++ intervals.columns).filter(_ == "_bucket")
    require(reserved.isEmpty,
      "bucketedRangeJoin reserves the column name _bucket; rename the input column")
    val pb = points.withColumn("_bucket",
      floor(col(valueCol) / bucketSize).cast("long"))
    // empty/inverted intervals contribute no rows — and must be dropped
    // BEFORE the explode: Spark's two-arg sequence(start, stop) steps -1
    // when start > stop, so an inverted interval would fan out a huge
    // descending bucket range instead of nothing
    val ib = intervals.filter(col(loCol) <= col(hiCol))
      .withColumn("_bucket",
        explode(sequence(
          floor(col(loCol) / bucketSize).cast("long"),
          floor(col(hiCol) / bucketSize).cast("long"))))
    pb.join(ib, Seq("_bucket"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("_bucket")
  }
}
