package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {

  // Extensions only apply when a NEW SparkSession instance is built;
  // getOrCreate would silently reuse the shared test session if another
  // suite built it first. Clear the active/default handles so this builder
  // constructs a fresh session (sharing the underlying SparkContext), then
  // restore the shared session for any suite that runs after us.
  lazy val spark: SparkSession = {
    val shared = SparkTestBase.session // ensure the shared one exists first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    SparkSession.setDefaultSession(shared)
    SparkSession.setActiveSession(shared)
    s
  }

  test("dot_product is callable from SQL") {
    val r = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .collect().head.getDouble(0)
    assert(r == 32.0)
  }

  test("word_shingles is callable from SQL") {
    val r = spark.sql("SELECT word_shingles('a b c d', 3) AS s")
      .collect().head.getSeq[String](0)
    assert(r == Seq("a b c", "b c d"))
    val partial = spark.sql("SELECT word_shingles('a b', 3) AS s")
      .collect().head.getSeq[String](0)
    assert(partial == Seq("a b"))
  }

  test("kmv_distinct is callable from SQL as an aggregate") {
    val est = spark.sql(
      "SELECT kmv_distinct(x, 64) FROM (SELECT explode(sequence(1, 40)) AS x)")
      .collect().head.getLong(0)
    assert(est == 40, "exact under capacity")
  }
}
