package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  def one(text: String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Any =
    Seq(text).toDF("text").select(c(col("text"))).collect().head.get(0)

  test("token counts") {
    assert(one("a b  c", TextAnalysis.tokenCount) == 3)
    assert(one("hello, world42!", TextAnalysis.bpeishTokenCount) == 5)
    // hello / , / world / 42 / !
  }

  test("language id picks marker-dominant language deterministically") {
    assert(one("the cat is on the mat and the dog", TextAnalysis.langId) == "en")
    assert(one("el gato y la casa de los perros", TextAnalysis.langId) == "es")
    assert(one("der hund und die katze ist nicht da", TextAnalysis.langId) == "de")
    assert(one("xyzzy qwerty plugh", TextAnalysis.langId) == "und")
    assert(one("你好世界", TextAnalysis.langId) == "zh")
  }

  test("quality score stays in [0,1] and rewards stopword-rich text") {
    val q1 = one("the of and to is in that a " * 10, TextAnalysis.qualityScore)
      .asInstanceOf[Double]
    val q2 = one("zzz", TextAnalysis.qualityScore).asInstanceOf[Double]
    assert(q1 > q2)
    assert(q1 <= 1.0 && q2 >= 0.0)
  }

  test("fingerprint is whitespace/case-insensitive") {
    val a = one("The  Quick   Fox", TextAnalysis.fingerprint)
    val b = one("the quick fox", TextAnalysis.fingerprint)
    assert(a == b)
  }

  test("shingle fingerprint equals min of shingle hashes") {
    val fp = one("a b c d", TextAnalysis.shingleFingerprint).asInstanceOf[Long]
    assert(fp > 0)
    // stable across invocations (pure function of content)
    assert(fp == one("a b c d", TextAnalysis.shingleFingerprint).asInstanceOf[Long])
  }
}
