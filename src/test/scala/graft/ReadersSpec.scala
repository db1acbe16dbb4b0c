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

  test("jdbc reader runs the real spark jdbc path against the contoso fixture") {
    // base_reader.py:16-29 with the fixture the reference ships
    // (contoso_sqlite_instructions.sql) served by an in-memory JDK-only
    // driver — schema probe, dialect fallback, and row fetch all execute
    FakeJdbc.executed.clear()
    val df = Readers.jdbc(spark, Map(
      "url" -> FakeJdbc.Url,
      "dbtable" -> "products",
      "driver" -> FakeJdbc.DriverClass,
      // empty creds must NOT be forwarded (reference's truthy guard), and
      // the guard holds CASE-INSENSITIVELY — JDBC option keys are
      // case-insensitive, so "User"/"PASSWORD" spellings must not slip an
      // empty credential (or a second Url) past the filter
      "User" -> "", "PASSWORD" -> ""))
    assert(df.schema.map(f => (f.name, f.dataType.typeName)) ==
      Seq(("product_id", "integer"), ("name", "string"), ("price", "double")))
    val got = df.collect().map(r =>
      (r.getInt(0), r.getString(1), r.getDouble(2))).sortBy(_._1)
    assert(got.toSeq == Seq(
      (10, "Phone", 699.0), (20, "Headphones", 199.0), (30, "Tablet", 499.0)))
    // column pruning reaches the remote query: selecting one column must
    // issue a SELECT over just that column, not SELECT *
    FakeJdbc.executed.clear()
    val names = df.select("name").collect().map(_.getString(0)).sorted
    assert(names.toSeq == Seq("Headphones", "Phone", "Tablet"))
    import scala.jdk.CollectionConverters._
    val dataSql = FakeJdbc.executed.asScala.filterNot(_.contains("1=0"))
    assert(dataSql.nonEmpty && dataSql.forall(s =>
      s.contains("name") && !s.contains("price")),
      s"pruned query must not fetch unused columns: $dataSql")
  }

  test("jdbc reader forwards NON-empty credentials regardless of key case") {
    // the inverse of the truthy guard: a mixed-case "Driver"/"User"/
    // "PASSWORD" spelling with a REAL value must reach the driver — an
    // exact-case lookup would consume the key in the filter but never
    // forward it (silent credential drop)
    FakeJdbc.lastConnectProps = new java.util.Properties()
    val df = Readers.jdbc(spark, Map(
      "url" -> FakeJdbc.Url,
      "dbtable" -> "products",
      "Driver" -> FakeJdbc.DriverClass,
      "User" -> "alice", "PASSWORD" -> "s3cret"))
    assert(df.count() == 3)
    val p = FakeJdbc.lastConnectProps
    assert(p.getProperty("user") == "alice" &&
      p.getProperty("password") == "s3cret",
      s"mixed-case credentials must be forwarded, got $p")
  }

  test("jdbc reader resolves case-variant credential duplicates deterministically") {
    // AGREEING case-variant duplicates are harmless — one value, forwarded
    FakeJdbc.lastConnectProps = new java.util.Properties()
    val df = Readers.jdbc(spark, Map(
      "url" -> FakeJdbc.Url,
      "dbtable" -> "products",
      "driver" -> FakeJdbc.DriverClass,
      "user" -> "alice", "User" -> "alice",
      "password" -> "s3cret", "Password" -> "s3cret"))
    assert(df.count() == 3)
    assert(FakeJdbc.lastConnectProps.getProperty("password") == "s3cret",
      s"agreeing variants must forward their one value: ${FakeJdbc.lastConnectProps}")
    // DIFFERING values are the same ambiguity whether or not a lowercase
    // spelling is among them — both shapes refuse (letting the lowercase
    // key silently win would forward one of two contradictory credentials)
    val e0 = intercept[IllegalArgumentException](Readers.jdbc(spark, Map(
      "url" -> FakeJdbc.Url,
      "dbtable" -> "products",
      "driver" -> FakeJdbc.DriverClass,
      "password" -> "right", "Password" -> "wrong")))
    assert(e0.getMessage.contains("conflicting case-variant"), e0.getMessage)
    // no lowercase spelling + DIFFERENT variant values: refused loudly
    val e = intercept[IllegalArgumentException](Readers.jdbc(spark, Map(
      "url" -> FakeJdbc.Url,
      "dbtable" -> "products",
      "driver" -> FakeJdbc.DriverClass,
      "User" -> "alice", "USER" -> "bob")))
    assert(e.getMessage.contains("conflicting case-variant"), e.getMessage)
  }

  test("jdbc reader against embedded Derby: creds guard + parallel slices") {
    // A REAL JDBC engine (Derby ships in /opt/spark/jars), exercising what
    // FakeJdbc cannot: genuine SQL parsing of the schema probe and the
    // per-partition WHERE slices, and the truthy-only credential guard
    // against an engine that would reject a forwarded empty user.
    val db = tmpDir("derby") + "/db"
    if (System.getProperty("derby.stream.error.file") == null)
      System.setProperty("derby.stream.error.file", tmpDir("derbylog") + "/derby.log")
    val conn = java.sql.DriverManager.getConnection(s"jdbc:derby:$db;create=true")
    try {
      val st = conn.createStatement()
      st.executeUpdate("""CREATE TABLE products
        ("product_id" INT PRIMARY KEY, "name" VARCHAR(64), "price" DOUBLE)""")
      st.executeUpdate("""INSERT INTO products VALUES
        (10,'Phone',699.0),(20,'Headphones',199.0),(30,'Tablet',499.0)""")
      st.close()
    } finally conn.close()
    val df = Readers.jdbc(spark, Map(
      "url" -> s"jdbc:derby:$db",
      "dbtable" -> "products",
      "driver" -> "org.apache.derby.jdbc.EmbeddedDriver",
      // truthy guard: must NOT be forwarded, in ANY key case (JDBC option
      // keys are case-insensitive — Derby rejects an empty user if one
      // slips through the consumed-set filter)
      "User" -> "", "Password" -> "",
      // scale passthrough: slice the read on the key
      "partitionColumn" -> "product_id",
      "lowerBound" -> "0", "upperBound" -> "40", "numPartitions" -> "2"))
    assert(df.rdd.getNumPartitions == 2,
      "partitionColumn/numPartitions must pass through to the JDBC source")
    val got = df.collect().map(r =>
      (r.getInt(0), r.getString(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(got == Seq(
      (10, "Phone", 699.0), (20, "Headphones", 199.0), (30, "Tablet", 499.0)),
      "partition slices must cover every row exactly once")
  }

  test("orc reader round-trips a written orc table") {
    val dir = tmpDir("orc") + "/t"
    spark.read.parquet("/root/testdata/sf0.001/region.parquet")
      .write.orc(dir)
    val df = Readers.orc(spark, Map("path" -> dir))
    assert(df.count() == 5)
    assert(df.columns.contains("r_name"))
  }

  test("text reader yields one string row per line") {
    val dir = tmpDir("txt")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "a.txt"),
      "line one\nline two\nline three\n".getBytes("UTF-8"))
    val df = Readers.text(spark, Map("path" -> dir))
    assert(df.columns.toSeq == Seq("value"))
    assert(df.count() == 3)
  }

  test("binaryfile reader exposes (path, length, content) with glob filter") {
    val dir = tmpDir("bin")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "img.png"), Array[Byte](1, 2, 3, 4))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "skip.txt"), Array[Byte](9))
    val df = Readers.binaryFile(
      spark, Map("path" -> dir, "pathGlobFilter" -> "*.png"))
    val rows = df.collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("length") == 4L)
    assert(rows.head.getAs[Array[Byte]]("content").toSeq == Seq[Byte](1, 2, 3, 4))
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
