package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document repetition statistics as ONE codegen'd pass over the text —
  * the Gopher-style quality signals (duplicate-token fraction, most-common-
  * word fraction, top-bigram fraction) without the explode → groupBy →
  * window formulation, which shuffles every token of the corpus twice.
  * At 100 TB the explode pipeline moves ~15× the corpus bytes through two
  * shuffles; this expression moves zero — it's a narrow projection fused
  * into the scan stage.
  *
  * Returns a struct (all counts exact):
  *   - n_tokens:    whitespace tokens after trim (cf. [[WordShingles.tokenize]])
  *   - n_distinct:  distinct tokens
  *   - top_word:    occurrences of the most frequent token
  *   - n_bigrams:   max(n_tokens − 1, 1) — mirrors WordShingles' partial-
  *                  shingle rule for single-token docs
  *   - top_bigram:  occurrences of the most frequent bigram
  *
  * Ratio columns (top_word / n_tokens etc.) are left to the caller so each
  * is a single IEEE division — bit-identical in any engine.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = RepetitionStats.schema

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"repetition_stats expects string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    RepetitionStats.computeUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = RepetitionStats.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.computeUtf8($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionStats {

  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("top_word", IntegerType, nullable = false),
    StructField("n_bigrams", IntegerType, nullable = false),
    StructField("top_bigram", IntegerType, nullable = false)))

  /** Single pass: token counts + bigram counts in two open-addressing-free
    * HashMaps. Referenced from generated code — keep public + stable.
    */
  // precompiled whitespace splitter (String.split("\\s+") recompiles the
  // Pattern on every call); Pattern.split is semantically identical
  private val WsPat = java.util.regex.Pattern.compile("\\s+")

  def computeUtf8(s: UTF8String): InternalRow = {
    val toks = WsPat.split(s.toString.trim)
    val wordCounts = new java.util.HashMap[String, Int]()
    var i = 0
    while (i < toks.length) {
      wordCounts.merge(toks(i), 1, Integer.sum(_, _))
      i += 1
    }
    var topWord = 0
    val wit = wordCounts.values().iterator()
    while (wit.hasNext) { val v = wit.next(); if (v > topWord) topWord = v }

    val bigramCounts = new java.util.HashMap[String, Int]()
    if (toks.length < 2) {
      // partial-shingle rule: a single-token doc has one "bigram" = itself
      bigramCounts.put(toks.mkString(" "), 1)
    } else {
      var j = 0
      while (j < toks.length - 1) {
        bigramCounts.merge(toks(j) + " " + toks(j + 1), 1, Integer.sum(_, _))
        j += 1
      }
    }
    var topBigram = 0
    val bit = bigramCounts.values().iterator()
    while (bit.hasNext) { val v = bit.next(); if (v > topBigram) topBigram = v }

    new GenericInternalRow(Array[Any](
      toks.length, wordCounts.size(), topWord,
      math.max(toks.length - 1, 1), topBigram))
  }

  def repetitionStats(c: Column): Column =
    ColumnBridge.column(RepetitionStats(ColumnBridge.expression(c)))
}
