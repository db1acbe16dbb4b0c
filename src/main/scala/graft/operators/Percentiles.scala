package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group percentiles with BOUNDED memory.
  *
  * The built-in `percentile` aggregate (sort-based TypedImperativeAggregate)
  * buffers every value of a group in executor memory — at an extreme group
  * size that's an OOM, not a spill. This formulation is count-then-kth:
  *
  *   1. one hash-partitioned WINDOW sort per group ranks the values
  *      (`row_number`) and carries the group size (`count` over the same
  *      partition — same exchange + sort, no second shuffle). Spark's window
  *      sort is an external, SPILLABLE sort: memory stays bounded no matter
  *      the group size;
  *   2. for each requested percentile p, the continuous-percentile position
  *      is pos = p·(n−1); ONLY the two bounding rows (rank ⌊pos⌋+1 and
  *      ⌊pos⌋+2) survive into a conditional-max aggregate;
  *   3. the final interpolation uses Spark's own Percentile formula
  *      `(higherIdx − pos)·lower + (pos − lowerIdx)·higher`, so results are
  *      bit-identical to the built-in aggregate's.
  *
  * Cost: the shuffle is the same one the buffering aggregate pays; the sort
  * replaces the per-group in-memory buffer. `extraAggs` ride in the same
  * final groupBy (they see the ranked rows: `_v` is the cast value column).
  */
object Percentiles {

  def exactPercentiles(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      ps: Seq[Double],
      extraAggs: Seq[Column] = Nil): DataFrame = {
    require(ps.nonEmpty, "no percentiles requested")
    require(ps.forall(p => p >= 0.0 && p <= 1.0), s"percentiles must be in [0,1]: $ps")
    val v = col(valueCol).cast("double")
    val rankW = Window.partitionBy(col(groupCol)).orderBy(col("_v"))
    val sizeW = Window.partitionBy(col(groupCol))
    val ranked = df
      .select(col(groupCol), v.as("_v"))
      .filter(col("_v").isNotNull) // percentile semantics: nulls don't count
      .withColumn("_rn", row_number().over(rankW))
      .withColumn("_n", count(lit(1)).over(sizeW))
    val boundAggs = ps.zipWithIndex.flatMap { case (p, i) =>
      val pos = lit(p) * (col("_n").cast("double") - 1)
      val lowerRank = floor(pos).cast("long") + 1
      Seq(
        max(when(col("_rn") === lowerRank, col("_v"))).as(s"_lo$i"),
        max(when(col("_rn") === lowerRank + 1, col("_v"))).as(s"_hi$i"))
    } :+ max(col("_n")).as("_gn")
    val allAggs = boundAggs ++ extraAggs
    val agged = ranked.groupBy(col(groupCol)).agg(allAggs.head, allAggs.tail: _*)
    val withPs = ps.zipWithIndex.foldLeft(agged) { case (d, (p, i)) =>
      val pos = lit(p) * (col("_gn").cast("double") - 1)
      val lowerIdx = floor(pos)
      // exactly Percentile.getPercentile: lower when the position is whole,
      // else the two-sided weighted form (bit-compatible interpolation)
      d.withColumn(s"p_$i",
        when(col(s"_hi$i").isNull || pos === lowerIdx, col(s"_lo$i"))
          .otherwise((lowerIdx + 1 - pos) * col(s"_lo$i") +
            (pos - lowerIdx) * col(s"_hi$i")))
    }
    withPs.drop(ps.indices.flatMap(i => Seq(s"_lo$i", s"_hi$i")) :+ "_gn": _*)
  }
}
