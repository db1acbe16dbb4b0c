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

  test("hub_keep_cols selects the declared hub projection (keep_cols scaffold)") {
    val df = Seq((1, "a", "drop-me")).toDF("id", "v", "raw_only")
    val s = src.copy(id = "kc", hubPrimaryKeys = Seq("id"),
      hubKeepCols = Seq("id", "v"))
    assert(Transform.toHub(df, s).columns.toSeq == Seq("id", "v"))
  }

  test("hub_keep_cols rejects unknown columns and dropped primary keys") {
    val df = Seq((1, "a")).toDF("id", "v")
    val bad1 = src.copy(id = "kc2", hubKeepCols = Seq("nope"))
    assert(intercept[IllegalArgumentException] {
      Transform.toHub(df, bad1)
    }.getMessage.contains("nope"))
    val bad2 = src.copy(id = "kc3", hubPrimaryKeys = Seq("id"),
      hubKeepCols = Seq("v"))
    assert(intercept[IllegalArgumentException] {
      Transform.toHub(df, bad2)
    }.getMessage.contains("primary keys"))
  }

  test("hub_keep_cols retains the merge tiebreak column implicitly") {
    val df = Seq((1, "a")).toDF("id", "v")
      .withColumn("_ingest_ts_utc", current_timestamp())
      .withColumn("_source_id", lit("s"))
    val s = src.copy(id = "kc4", hubPrimaryKeys = Seq("id"),
      hubKeepCols = Seq("id", "v"))
    val out = Transform.toHub(df, s)
    assert(out.columns.toSet == Set("id", "v", "_ingest_ts_utc"),
      "keep-list applies but the last-writer-wins tiebreak survives")
  }

  test("a registered override composes with hub_keep_cols, not replaces it") {
    Transform.register("kc5", (df, _) => df.withColumn("derived", lit(1)))
    val df = Seq((1, "a", "x")).toDF("id", "v", "raw_only")
    val s = src.copy(id = "kc5", hubPrimaryKeys = Seq("id"),
      hubKeepCols = Seq("id", "v", "derived"))
    val out = Transform.toHub(df, s)
    assert(out.columns.toSeq == Seq("id", "v", "derived"),
      "override computes the column; keep-list still projects and validates")
  }

  test("catalog rejects two enabled sources on one (domain, entity) path") {
    val e = intercept[IllegalArgumentException] {
      graft.catalog.YamlCatalog.loadString(
        """version: 1
          |defaults: {}
          |sources:
          |  - id: a
          |    type: csv
          |    domain: sales
          |    entity: orders
          |  - id: b
          |    type: json
          |    domain: sales
          |    entity: orders
          |""".stripMargin)
    }
    assert(e.getMessage.contains("same (domain, entity)"))
  }

  test("catalog parses hub_keep_cols") {
    val sys = graft.catalog.YamlCatalog.loadString(
      """version: 1
        |defaults: {}
        |sources:
        |  - id: s1
        |    type: csv
        |    hub_keep_cols: [a, b]
        |""".stripMargin)
    assert(sys.sources.head.hubKeepCols == Seq("a", "b"))
  }
}
