package graft

import graft.functions.KmvDistinct.kmvDistinct
import graft.queries.Tables
import org.apache.spark.sql.functions._

class KmvDistinctSpec extends SparkTestBase {
  import spark.implicits._

  test("exact below k distinct values") {
    val df = (1 to 100).map(i => i % 37).toDF("x").repartition(8)
    val est = df.agg(kmvDistinct($"x", 64)).collect().head.getLong(0)
    assert(est == 37, "sketch must be exact while under capacity")
  }

  test("estimates within 15% at 2k distinct over many partitions (merge path)") {
    val df = (1 to 20000).map(i => i % 2000).toDF("x").repartition(32)
    val est = df.agg(kmvDistinct($"x", 256)).collect().head.getLong(0)
    assert(math.abs(est - 2000).toDouble / 2000 < 0.15, s"estimate $est")
  }

  test("works grouped and on real data next to exact counts") {
    val li = Tables(spark, "/root/testdata/sf0.01", "lineitem")
    val rows = li.groupBy($"l_returnflag")
      .agg(kmvDistinct($"l_partkey", 256).as("kmv"),
        countDistinct($"l_partkey").as("exact"))
      .collect()
    rows.foreach { r =>
      val (kmv, exact) = (r.getAs[Long]("kmv"), r.getAs[Long]("exact"))
      assert(math.abs(kmv - exact).toDouble / exact < 0.15, s"$kmv vs $exact")
    }
  }

  test("null inputs are ignored") {
    val df = Seq(Some(1), None, Some(2), None, Some(1)).toDF("x")
    val est = df.agg(kmvDistinct($"x", 64)).collect().head.getLong(0)
    assert(est == 2)
  }
}
