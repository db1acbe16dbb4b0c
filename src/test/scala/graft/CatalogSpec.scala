package graft

import graft.catalog.YamlCatalog
import org.scalatest.funsuite.AnyFunSuite

class CatalogSpec extends AnyFunSuite {

  val yaml: String =
    """version: 1
      |defaults:
      |  raw_base: /tmp/lake/raw
      |  hub_base: /tmp/lake/hub
      |  checkpoint_base: /tmp/lake/_checkpoints
      |  domain: sales
      |sources:
      |  - id: customers_csv
      |    enabled: true
      |    type: csv
      |    domain: sales
      |    entity: customers
      |    options:
      |      path: /x/customers.csv
      |      header: true
      |      inferSchema: true
      |      mode: PERMISSIVE
      |    raw_partitions: ["ingest_date"]
      |    hub_primary_keys: ["customer_id"]
      |  - id: products_jdbc
      |    enabled: false
      |    type: jdbc
      |    domain: sales
      |    entity: products
      |    options: {url: "jdbc:sqlite:x", dbtable: products}
      |  - id: minimal
      |    type: parquet
      |""".stripMargin

  test("parses version, defaults, and all sources") {
    val sys = YamlCatalog.loadString(yaml)
    assert(sys.version == 1)
    assert(sys.defaults("raw_base") == "/tmp/lake/raw")
    assert(sys.sources.map(_.id) == Seq("customers_csv", "products_jdbc", "minimal"))
  }

  test("source fields and option stringification") {
    val s = YamlCatalog.loadString(yaml).sources.head
    assert(s.`type` == "csv" && s.entity == "customers")
    assert(s.options("header") == "true" && s.options("inferSchema") == "true")
    assert(s.hubPrimaryKeys == Seq("customer_id"))
  }

  test("defaulting matches reference metadata.py:7,12-13") {
    val m = YamlCatalog.loadString(yaml).sources.find(_.id == "minimal").get
    assert(m.enabled, "enabled defaults true")
    assert(m.rawPartitions == Seq("ingest_date"), "raw_partitions default")
    assert(m.hubPrimaryKeys.isEmpty, "hub_primary_keys default empty")
  }

  test("disabled flag parses") {
    assert(!YamlCatalog.loadString(yaml).sources(1).enabled)
  }

  test("duplicate source ids are rejected") {
    val e = intercept[IllegalArgumentException] {
      graft.catalog.YamlCatalog.loadString(
        """version: 1
          |defaults: {}
          |sources:
          |  - id: a
          |    type: csv
          |  - id: a
          |    type: json
          |""".stripMargin)
    }
    assert(e.getMessage.contains("duplicate source ids"))
  }

  test("reference catalog itself parses") {
    val ref = YamlCatalog.load(
      "/root/reference/metadata_ingestion/metadata/sources.yaml")
    assert(ref.sources.size == 4)
    assert(ref.sources.count(_.enabled) == 3)
    assert(ref.sources.find(_.id == "cube_sales_olap").get.hubPrimaryKeys ==
      Seq("category", "calendar_year"))
  }
}
