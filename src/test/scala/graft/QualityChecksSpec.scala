package graft

import graft.operators.{QualityChecks => QC}
import graft.operators.QualityChecks.{InRange, InSet, Matches, NotNull, Unique}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class QualityChecksSpec extends SparkTestBase {
  import spark.implicits._

  val schema = StructType(Seq(
    StructField("id", IntegerType), StructField("v", StringType),
    StructField("x", DoubleType)))

  lazy val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
    Row(1, "ok", 5.0),
    Row(1, "ok", 50.0),   // duplicate id, x out of range
    Row(null, "bad!", 7.0), // null id, regex violation
    Row(3, null, 2.0)     // null v: not a Matches violation
  )), schema)

  test("each rule counts its violations in one pass") {
    val out = QC.run(df, Seq(
      NotNull("id"), Unique(Seq("id")), InRange("x", 0, 10),
      Matches("v", "^[a-z]+$"), InSet("v", Seq("ok"))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("not_null:id") == 1)
    assert(out("unique:id") == 1)
    assert(out("in_range:x") == 1)
    assert(out("matches:v") == 1, "null v must not count")
    assert(out("in_set:v") == 1)
  }

  test("summary carries n_rows and pass flag") {
    val rows = QC.run(df, Seq(NotNull("x"))).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("n_rows") == 4)
    assert(r.getAs[Boolean]("pass"))
  }

  test("min_rows and null_ratio rules count violations") {
    import graft.operators.QualityChecks.{MinRows, NullRatio}
    val out = QC.run(df, Seq(MinRows(10), NullRatio("id", 0.1)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("min_rows:10") == 6, "4 rows, need 10 -> 6 missing")
    assert(out("null_ratio:id") == 1, "1/4 nulls > 10% -> null count reported")
    val ok = QC.run(df, Seq(MinRows(3), NullRatio("id", 0.5)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ok("min_rows:3") == 0)
    assert(ok("null_ratio:id") == 0, "1/4 nulls <= 50% -> pass")
  }

  test("duplicate rule names are rejected up front") {
    val e = intercept[IllegalArgumentException] {
      QC.run(df, Seq(InRange("x", 0, 10), InRange("x", 5, 20)))
    }
    assert(e.getMessage.contains("in_range:x"))
  }

  test("referential integrity counts orphans") {
    val parent = Seq(1, 2).toDF("pk")
    val child = Seq(1, 1, 2, 9).toDF("fk")
    val r = QC.referential(child, "fk", parent, "pk").collect().head
    assert(r.getAs[Long]("violations") == 1)
    assert(r.getAs[Long]("n_rows") == 4)
    assert(!r.getAs[Boolean]("pass"))
  }

  test("referential: null fks and duplicate parent keys don't distort counts") {
    val parent = Seq(1, 1, 2).toDF("pk") // dup pk must not fan out child rows
    val child = Seq(Some(1), Some(1), None, Some(9)).toDF("fk")
    val r = QC.referential(child, "fk", parent, "pk").collect().head
    assert(r.getAs[Long]("n_rows") == 4) // null fk counts as a row
    assert(r.getAs[Long]("violations") == 1) // only 9; null never violates
  }

  test("referential construction is lazy — no eager child scan") {
    import org.apache.spark.sql.functions.udf
    val boom = udf(() => {
      throw new RuntimeException("referential evaluated the child eagerly")
      1
    })
    val child = spark.range(3).select(boom().as("fk"))
    // an eager count() inside referential would execute `boom` right here
    QC.referential(child, "fk", spark.range(3).toDF("pk"), "pk")
  }
}
