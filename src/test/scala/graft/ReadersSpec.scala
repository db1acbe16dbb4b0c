package graft

import graft.readers.Readers

class ReadersSpec extends SparkTestBase {

  test("csv reader honors header+inferSchema and pops path") {
    val df = Readers.csv(
      spark,
      Map("path" -> resource("/samples/customers.csv"),
          "header" -> "true", "inferSchema" -> "true"))
    assert(df.count() == 3)
    assert(df.schema("customer_id").dataType.typeName == "integer")
    val ana = df.filter(df("customer_id") === 1).collect().head
    assert(ana.getAs[String]("first_name") == "Ana")
    assert(ana.getAs[String]("last_name") == "García") // UTF-8 survives
  }

  test("json reader reads JSON lines") {
    val df = Readers.json(
      spark, Map("path" -> resource("/samples/orders.json"), "multiline" -> "false"))
    assert(df.count() == 3)
    assert(df.schema("amount").dataType.typeName == "double")
  }

  test("parquet reader reads testdata") {
    val df = Readers.parquet(
      spark, Map("path" -> "/root/testdata/sf0.001/region.parquet"))
    assert(df.count() == 5)
  }

  test("olap reader falls back to header-only csv: all columns string") {
    val df = Readers.olap(
      spark,
      Map("xmla_endpoint" -> "powerbi://api.powerbi.com/v1.0/myorg/X",
          "mdx" -> "SELECT ...",
          "fallback_csv_path" -> resource("/samples/cube_sales_fallback.csv")))
    assert(df.count() == 4)
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
    assert(df.columns.toSeq == Seq("category", "calendar_year", "sales"))
  }

  test("unknown type raises with reference's message shape") {
    val e = intercept[IllegalArgumentException](Readers.get("xml"))
    assert(e.getMessage.contains("Unsupported source type: xml"))
  }

  test("registry covers all five reference reader types") {
    assert(Set("csv", "json", "parquet", "jdbc", "olap")
      .subsetOf(Readers.registry.keySet))
  }

  test("registry is the extension point: custom readers can be registered") {
    Readers.register("constant", (s, opts) => {
      import s.implicits._
      Seq(opts.getOrElse("value", "?")).toDF("v")
    })
    val df = Readers.get("constant")(spark, Map("value" -> "hi"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("hi"))
  }
}
