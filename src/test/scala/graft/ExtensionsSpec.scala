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

  test("simhash / minhash_signature / md5_hash60 callable from SQL") {
    val row = spark.sql(
      """SELECT simhash('hello world hello', 32) AS sh,
        |       minhash_signature('a b c d e', 3) AS mh,
        |       md5_hash60('x') AS h60""".stripMargin).collect().head
    // values must match the Column-API formulations bit-for-bit
    assert(row.getLong(0) ==
      graft.functions.TextHashing.simHash(
        org.apache.spark.unsafe.types.UTF8String.fromString("hello world hello"), 32))
    assert(row.getSeq[Long](1).length == 16)
    assert(row.getLong(2) == graft.functions.TextHashing.md5Hash60("x"))
  }

  test("bpe_stats is callable from SQL and matches the Scala encoder") {
    val row = spark.sql(
      """SELECT s.n_words, s.n_tokens_bpe, s.sum_token_ids
        |FROM (SELECT bpe_stats('the line scans fast') AS s)""".stripMargin)
      .collect().head
    val (nw, nt, sum) = graft.operators.Bpe.statsOf(
      "the line scans fast", graft.operators.Bpe.DefaultMerges)
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((nw, nt, sum)))
  }

  test("repetition_stats is callable from SQL") {
    val row = spark.sql(
      """SELECT s.n_tokens AS nt, s.n_distinct AS nd, s.top_word AS tw,
        |       s.top_bigram AS tb
        |FROM (SELECT repetition_stats('a b a b a c') AS s)""".stripMargin)
      .collect().head
    assert(row.getAs[Int]("nt") == 6)
    assert(row.getAs[Int]("nd") == 3)
    assert(row.getAs[Int]("tw") == 3)
    assert(row.getAs[Int]("tb") == 2)
  }

  test("gopher_repetition is callable from SQL") {
    val row = spark.sql(
      """SELECT s.n_lines, s.dup_lines, s.word_chars, s.top2_chars
        |FROM (SELECT gopher_repetition('x\ny\nx\nab ab ab') AS s)"""
        .stripMargin)
      .collect().head
    // lines: x, y, x, "ab ab ab" → 4 lines, one dup; words: x y x ab ab ab
    assert(row.getLong(0) == 4L && row.getLong(1) == 1L)
    assert(row.getLong(2) == 9L) // 3×1 + 3×2 word chars
    assert(row.getLong(3) == 8L) // "ab ab" twice × 4 chars
  }

  test("cms_sketch + cms_estimate compose in SQL") {
    val est = spark.sql(
      """SELECT cms_estimate(sk, CAST(5 AS BIGINT)) FROM (
        |  SELECT cms_sketch(CAST(v % 10 AS BIGINT), 5, 256) AS sk
        |  FROM (SELECT explode(sequence(1, 1000)) AS v))""".stripMargin)
      .collect().head.getLong(0)
    assert(est >= 100 && est <= 100 + (math.E * 1000 / 256).toLong,
      s"estimate $est outside CMS bound")
  }
}
