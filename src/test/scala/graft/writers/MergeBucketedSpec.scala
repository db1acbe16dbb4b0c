package graft.writers

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The single-exchange bucketed merge ([[HubWriter.mergeBucketedByRun]])
  * must pick exactly the rows the classic key-window [[HubWriter.merge]]
  * picks — and do it with ONE Exchange (the bucket window) where the
  * classic form pays a key-hash exchange plus the optimized write's
  * bucket repartition.
  */
class MergeBucketedSpec extends SparkTestBase {
  import spark.implicits._

  private def stamp(df: org.apache.spark.sql.DataFrame) =
    df.withColumn(HubWriter.BucketCol,
      pmod(coalesce(col("k"), lit(-7)), lit(4)).cast("int"))

  test("property: run-merge == classic merge on random keyed batches") {
    val rnd = new scala.util.Random(42)
    for (round <- 1 to 8) {
      def batch(epoch: Int, n: Int) = (0 until n).map { i =>
        val k: java.lang.Integer =
          if (rnd.nextInt(10) == 0) null else Int.box(rnd.nextInt(12))
        (k, rnd.nextInt(1000),
          new java.sql.Timestamp(epoch * 1000000L + i * 1000L))
      }.toDF("k", "v", "_ingest_ts_utc")
      // target = an already-deduped hub snapshot (unique non-null keys,
      // plus a couple of null-keyed survivors)
      val target = batch(1, 30)
        .withColumn("_rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(coalesce(col("k"), lit(-99)))
            .orderBy(col("_ingest_ts_utc").desc)))
        .filter(col("_rn") === 1 || col("k").isNull).drop("_rn")
      val source = batch(2, 25)
      val classic = HubWriter.merge(target, source, Seq("k"))
        .select("k", "v", "_ingest_ts_utc")
      val run = HubWriter.mergeBucketedByRun(
          stamp(target), stamp(source), Seq("k"), HubWriter.BucketCol)
        .select("k", "v", "_ingest_ts_utc")
      val c = classic.collect().toSeq
        .map(r => (Option(r.get(0)), r.get(1), r.get(2))).sortBy(_.toString)
      val g = run.collect().toSeq
        .map(r => (Option(r.get(0)), r.get(1), r.get(2))).sortBy(_.toString)
      assert(g == c, s"round $round diverged")
    }
  }

  test("plan gate: run-merge carries exactly ONE Exchange") {
    val target = Seq((1, 10), (2, 20)).toDF("k", "v")
    val source = Seq((2, 21), (3, 30)).toDF("k", "v")
    val run = HubWriter.mergeBucketedByRun(
      stamp(target), stamp(source), Seq("k"), HubWriter.BucketCol)
    val plan = run.queryExecution.executedPlan.toString
    val nEx = "(?<!Reused)Exchange".r.findAllIn(plan).length
    assert(nEx == 1, s"expected 1 Exchange, got $nEx in:\n$plan")
  }
}
