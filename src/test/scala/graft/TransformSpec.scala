package graft

import graft.catalog.Source
import graft.transform.Transform
import org.apache.spark.sql.functions._

class TransformSpec extends SparkTestBase {
  import spark.implicits._

  val src = Source(id = "t1", `type` = "csv", domain = "d", entity = "e")

  test("default transform is the identity (reference transform.py:5-9)") {
    val df = Seq((1, "a")).toDF("id", "v")
    assert(Transform.toHub(df, src) eq df)
  }

  test("registered per-source transform applies only to that source") {
    Transform.register("t1", (df, _) => df.withColumn("extra", lit(true)))
    val df = Seq((1, "a")).toDF("id", "v")
    assert(Transform.toHub(df, src).columns.contains("extra"))
    assert(!Transform.toHub(df, src.copy(id = "other")).columns.contains("extra"))
  }
}
