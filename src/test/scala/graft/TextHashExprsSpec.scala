package graft

import graft.functions.TextHashExprs
import graft.operators.{Shingles, TextAnalysis}
import graft.queries.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The codegen'd one-pass hash expressions must be bit-identical to the
  * column-composed formulations they replaced (which the DuckDB oracles
  * validated): same md5-prefix arithmetic, same shingling/tokenization
  * edge cases.
  */
class TextHashExprsSpec extends SparkTestBase {
  import spark.implicits._

  /** Real corpus plus the edge cases: empty, whitespace-only, fewer tokens
    * than the shingle width, repeated tokens, interior multi-space runs,
    * accents + CJK + an astral (non-BMP) code point.
    */
  def corpus: DataFrame =
    Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
      .unionByName(Seq(
        (100001L, ""), (100002L, "   "), (100003L, "one"),
        (100004L, "two words"), (100005L, "a a a a"),
        (100006L, "  padded   interior\truns\nnewline  "),
        (100007L, "García 安全 data 安全 𝄞clef mixed"),
        (100008L, "the quick brown fox jumps over the lazy dog")
      ).toDF("doc_id", "text"))

  val legacyHash60: String => org.apache.spark.sql.Column = c =>
    conv(substring(md5(col(c)), 1, 15), 16, 10).cast("long")

  test("md5Hash60 equals conv(substring(md5,1,15),16,10)") {
    val rows = corpus
      .select(TextHashExprs.md5Hash60(col("text")).as("fast"),
        legacyHash60("text").as("legacy"))
      .filter(col("fast") =!= col("legacy"))
    assert(rows.isEmpty, rows.collect().mkString(", "))
  }

  test("wordShingleHash31Set equals the explode+hash31+distinct pipeline") {
    for (n <- Seq(1, 2, 3, 5)) {
      val fast = corpus.select(col("doc_id"),
        explode(TextHashExprs.wordShingleHash31Set(col("text"), n)).as("h"))
      val legacy = corpus.select(col("doc_id"),
        explode(graft.functions.WordShingles.wordShingles(col("text"), n))
          .as("shingle"))
        .select(col("doc_id"),
          (legacyHash60("shingle") % 2147483647L).as("h"))
        .distinct()
      assert(fast.exceptAll(legacy).isEmpty && legacy.exceptAll(fast).isEmpty,
        s"n=$n mismatch")
    }
  }

  test("charShingleHash31Set equals the charShingles+hash31+distinct pipeline") {
    for (n <- Seq(2, 5)) {
      val fast = corpus.select(col("doc_id"),
        explode(TextHashExprs.charShingleHash31Set(
          TextAnalysis.normalize(col("text")), n)).as("h"))
      val legacy = corpus.select(col("doc_id"),
        explode(Shingles.charShingles(col("text"), n)).as("shingle"))
        .select(col("doc_id"),
          (legacyHash60("shingle") % 2147483647L).as("h"))
        .distinct()
      assert(fast.exceptAll(legacy).isEmpty && legacy.exceptAll(fast).isEmpty,
        s"n=$n mismatch")
    }
  }

  test("minHashSignature equals the 16 min-aggregates over postings") {
    val fast = graft.operators.Dedup.minhashSignatureFromText(
      corpus, "text", "doc_id")
    val legacy = graft.operators.Dedup.minhashSignature(
      graft.operators.Dedup.shingleHashes(corpus, "text", "doc_id"), "doc_id")
    assert(fast.exceptAll(legacy).isEmpty && legacy.exceptAll(fast).isEmpty)
    assert(fast.count() == corpus.count())
  }

  test("simHash equals the explode+bit-sum groupBy formulation (32 and 60)") {
    for (bits <- Seq(32, 60)) {
      val fast = corpus.select(col("doc_id"),
        TextHashExprs.simHash(col("text"), bits).as("simhash"))
      val toks = corpus.select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .withColumn("h",
          if (bits < 60) legacyHash60("tok") % (1L << bits)
          else legacyHash60("tok"))
      val sums = (0 until bits).map(i =>
        sum(shiftright(col("h"), i) % 2 * 2 - 1).as(s"s$i"))
      val value = (0 until bits).map(i =>
        when(col(s"s$i") >= 0, lit(1L << i)).otherwise(lit(0L))).reduce(_ + _)
      val legacy = toks.groupBy(col("doc_id")).agg(sums.head, sums.tail: _*)
        .select(col("doc_id"), value.as("simhash"))
      assert(fast.exceptAll(legacy).isEmpty && legacy.exceptAll(fast).isEmpty,
        s"bits=$bits mismatch")
    }
  }

  test("wordShingleMinHash60 equals array_min over hashed shingles") {
    val fast = corpus.select(col("doc_id"),
      TextHashExprs.wordShingleMinHash60(col("text"), 3).as("fp"))
    val legacy = corpus.select(col("doc_id"),
      array_min(transform(
        Shingles.wordShingles(TextAnalysis.tokens(col("text")), 3),
        s => conv(substring(md5(s), 1, 15), 16, 10).cast("long"))).as("fp"))
    assert(fast.exceptAll(legacy).isEmpty && legacy.exceptAll(fast).isEmpty)
  }

  test("set expressions return sorted distinct arrays (deterministic order)") {
    val arrs = corpus.select(
      TextHashExprs.wordShingleHash31Set(col("text"), 3).as("w"),
      TextHashExprs.charShingleHash31Set(
        TextAnalysis.normalize(col("text")), 5).as("c"))
      .as[(Seq[Long], Seq[Long])].collect()
    arrs.foreach { case (w, c) =>
      assert(w == w.distinct.sorted, s"word set not sorted-distinct: $w")
      assert(c == c.distinct.sorted, s"char set not sorted-distinct: $c")
    }
  }
}
